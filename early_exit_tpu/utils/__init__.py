from early_exit_tpu.utils.model_utils import count_parameters
from early_exit_tpu.utils.metrics import wer, WerAccumulator, MetricsLogger
from early_exit_tpu.utils.epoch_timer import epoch_time

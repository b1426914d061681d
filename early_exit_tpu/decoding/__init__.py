from early_exit_tpu.decoding import aed_beam, lexicon
from early_exit_tpu.ops.ctc import greedy_decode

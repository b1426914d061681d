from early_exit_tpu.decoding import aed_beam, lexicon, prefix_beam
from early_exit_tpu.ops.ctc import greedy_decode

from early_exit_tpu.ops import ctc, frontend

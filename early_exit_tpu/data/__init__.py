from early_exit_tpu.data import bucketing, librispeech, pipeline, text

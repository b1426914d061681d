from early_exit_tpu.training import trainer, checkpoint

from early_exit_tpu.optim.noam import noam_schedule, make_optimizer

from early_exit_tpu.ops.pallas import attention

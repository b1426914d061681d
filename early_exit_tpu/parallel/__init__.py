from early_exit_tpu.parallel.mesh import (
    make_mesh,
    param_pspec,
    shard_params,
    shard_batch,
    DATA_AXIS,
    MODEL_AXIS,
)

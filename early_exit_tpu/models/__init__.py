from early_exit_tpu.models.registry import build_model, MODEL_REGISTRY

"""Model registry: name -> (init, apply) module.

Mirrors the model selection in train.py:148-212 / inference.py:125-186
(`--decoder_mode` + `--model_type`).
"""

from __future__ import annotations

from early_exit_tpu.configs import ModelConfig

MODEL_REGISTRY = {}


def register(name):
    def deco(mod):
        MODEL_REGISTRY[name] = mod
        return mod
    return deco


def build_model(cfg: ModelConfig):
    """Returns the module (namespace with init/apply) for cfg.model_type."""
    # imported lazily to avoid cycles
    from early_exit_tpu.models import early_conformer
    mods = {"early_conformer": early_conformer}
    try:
        from early_exit_tpu.models import splitformer
        mods["splitformer"] = splitformer
    except ImportError:
        pass
    try:
        from early_exit_tpu.models import zipformer
        mods["early_zipformer"] = zipformer
    except ImportError:
        pass
    try:
        from early_exit_tpu.models import full_conformer
        mods["full_conformer"] = full_conformer
    except ImportError:
        pass
    if cfg.model_type not in mods:
        raise ValueError(f"unknown model_type: {cfg.model_type}")
    return mods[cfg.model_type]

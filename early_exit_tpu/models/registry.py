"""Model registry: name -> module exposing init/apply.

Mirrors the model selection in train.py:148-212 / inference.py:125-186
(`--decoder_mode` + `--model_type`). Modules are imported lazily so a
broken optional model never blocks the others.
"""

from __future__ import annotations

import importlib

from early_exit_tpu.configs import ModelConfig

# name -> module path (all part of the zoo; full_conformer is selected by
# --decoder_mode aed rather than --model_type, cli.py)
_MODEL_MODULES = {
    "early_conformer": "early_exit_tpu.models.early_conformer",
    "splitformer": "early_exit_tpu.models.splitformer",
    "early_zipformer": "early_exit_tpu.models.zipformer",
    "full_conformer": "early_exit_tpu.models.full_conformer",
}

MODEL_REGISTRY = {}


def build_model(cfg: ModelConfig):
    """Returns the module (namespace with init/apply) for cfg.model_type."""
    name = cfg.model_type
    if name not in _MODEL_MODULES:
        raise ValueError(f"unknown model_type: {name} "
                         f"(choices: {sorted(_MODEL_MODULES)})")
    if name not in MODEL_REGISTRY:
        MODEL_REGISTRY[name] = importlib.import_module(_MODEL_MODULES[name])
    return MODEL_REGISTRY[name]

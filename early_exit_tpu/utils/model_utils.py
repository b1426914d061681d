"""Parameter utilities (util/model_utils.py parity, pytree-native)."""

from __future__ import annotations

import jax
import numpy as np


def count_parameters(params) -> int:
    """Total trainable parameter count (util/model_utils.py:6-7)."""
    return int(sum(np.prod(l.shape) for l in
                   jax.tree_util.tree_leaves(params)))


def tree_bytes(params) -> int:
    return int(sum(np.prod(l.shape) * l.dtype.itemsize
                   for l in jax.tree_util.tree_leaves(params)))

"""Time subsampling / resampling modules.

Parity targets (behavioral, not line-by-line):
- Conv1dSubsampling: two Conv1d(k=3, s=2, padding=0), no activation —
  models/model/early_exit.py:24-48. Output time = floor((T-3)/2)+1 twice
  (~T/4).
- Conv2dSubsampling (misnamed in the reference — actually Conv1d + ReLU ×2):
  early_exit.py:51-77.
- Conv1dSubsampling_Zipformer: single Conv1d(k=3, s=2) — early_exit.py:80-94.
- Upsampling = repeat_interleave over time (early_exit.py:97-104);
  Downsampling = strided slice (early_exit.py:107-114).

All functions use feature-last (B, T, C) layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from early_exit_tpu.nn import core as nn


def conv_subsample_init(key: jax.Array, c_in: int, c_out: int,
                        *, n_convs: int = 2) -> nn.Param:
    keys = jax.random.split(key, n_convs)
    layers = []
    cur = c_in
    for k in keys:
        layers.append(nn.conv1d_init(k, cur, c_out, 3))
        cur = c_out
    return {"convs": layers}


def conv_subsample_apply(p: nn.Param, x: jax.Array, *, relu: bool = False,
                         compute_dtype=None) -> jax.Array:
    """(B, T, C) -> (B, T', d_model); stride-2 VALID convs."""
    for conv in p["convs"]:
        x = nn.conv1d(conv, x, stride=2, padding="VALID",
                      compute_dtype=compute_dtype)
        if relu:
            x = jax.nn.relu(x)
    return x


def subsampled_length(lengths: jax.Array, n_convs: int = 2) -> jax.Array:
    """True frame count after VALID k=3 s=2 convs (per-item)."""
    out = lengths
    for _ in range(n_convs):
        out = (out - 3) // 2 + 1
    return jnp.maximum(out, 0)


def reference_subsampled_length(lengths: jax.Array, factor: int,
                                max_t: int) -> jax.Array:
    """The reference's length rule: clamp(lengths / factor, max=T')
    truncated to int (early_exit.py:623, 178)."""
    return jnp.minimum((lengths / factor).astype(jnp.int32), max_t)


def upsample(x: jax.Array, factor: int) -> jax.Array:
    """repeat_interleave over time (early_exit.py:97-104)."""
    return jnp.repeat(x, factor, axis=1)


def downsample(x: jax.Array, factor: int) -> jax.Array:
    """Strided slice over time (early_exit.py:107-114)."""
    return x[:, ::factor, :]

"""Pallas fused multi-head self-attention (TPU).

The Conformer's MHSA is the only op where XLA materialises a large
intermediate in HBM: the (B, H, T, T) score tensor crosses HBM twice
(scores out, softmax back in). This kernel keeps Q·Kᵀ, the masked softmax
and the value contraction for one (batch, head) entirely in VMEM — one
HBM read of Q/K/V and one write of O.

Shapes here are ASR-scale (T ≤ ~1000 after 4× subsampling, dh = 32..64),
so a whole (T, dh) head fits VMEM comfortably and no online-softmax
tiling is needed; the grid is simply (B, H). Falls back to the XLA path
(`nn.mha`) under jax.vmap or on non-TPU backends via `interpret=True`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_TPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_TPU = False

NEG = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32)          # (T, dh)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    m = mask_ref[0]                              # (1, T) float 0/1

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (T, T)
    s = jnp.where(m > 0.5, s, NEG)               # broadcast over rows
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    mask: jax.Array, *, interpret: bool = False
                    ) -> jax.Array:
    """q, k, v: (B, H, T, dh) — self-attention with key-padding mask.

    mask: (B, T) bool/0-1, True where the key position is valid.
    Returns (B, H, T, dh) float32.
    """
    B, H, T, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    maskf = mask.astype(jnp.float32).reshape(B, 1, T)

    kernel = functools.partial(_attn_kernel, scale=scale)
    grid = (B, H)

    def qkv_spec():
        return pl.BlockSpec((1, 1, T, dh), lambda b, h: (b, h, 0, 0))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec(), qkv_spec(), qkv_spec(),
                  pl.BlockSpec((1, 1, T), lambda b, h: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, T, dh), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, T, dh), jnp.float32),
        interpret=interpret,
    )(q, k, v, maskf)


def mha_pallas(p, x: jax.Array, n_heads: int, *, key_mask: jax.Array,
               compute_dtype=None, interpret: bool = False) -> jax.Array:
    """Drop-in for nn.mha on the self-attention path (q = kv = x)."""
    from early_exit_tpu.nn import core as nn
    B, T, D = x.shape
    dh = D // n_heads
    q = nn.linear(p["q"], x, compute_dtype=compute_dtype)
    k = nn.linear(p["k"], x, compute_dtype=compute_dtype)
    v = nn.linear(p["v"], x, compute_dtype=compute_dtype)
    q = q.reshape(B, T, n_heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, n_heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, n_heads, dh).transpose(0, 2, 1, 3)
    if key_mask is None:
        key_mask = jnp.ones((B, T), bool)
    o = fused_attention(q, k, v, key_mask, interpret=interpret)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, D)
    return nn.linear(p["o"], o, compute_dtype=compute_dtype)

"""Pre-norm Transformer decoder (functional, KV-cache ready).

Capability parity with the per-exit `nn.TransformerDecoder` stacks the
reference builds (models/model/early_exit.py:701-717: norm_first,
batch_first, ReLU FFN, shared final LayerNorm) — reimplemented
functionally so layers scan, weights stack across exits, and incremental
decoding can reuse cached keys/values (the reference re-runs the full
decoder every beam step, util/beam_infer.py:236-240).

Layer (pre-norm):
    x = x + Drop(SelfAttn(LN1(x), causal + target-pad mask))
    x = x + Drop(CrossAttn(LN2(x), memory))      # no memory mask (parity:
                                                 # the reference never
                                                 # passes one)
    x = x + Drop(W2(Drop(ReLU(W1(LN3(x))))))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from early_exit_tpu.nn import core as nn


def layer_init(key: jax.Array, d_model: int, d_ff: int) -> nn.Param:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "ln1": nn.layer_norm_init(d_model),
        "self_attn": nn.mha_init(k1, d_model),
        "ln2": nn.layer_norm_init(d_model),
        "cross_attn": nn.mha_init(k2, d_model),
        "ln3": nn.layer_norm_init(d_model),
        "w1": nn.linear_init(k3, d_model, d_ff),
        "w2": nn.linear_init(k4, d_ff, d_model),
    }


def stack_init(key: jax.Array, d_model: int, d_ff: int, n_layers: int):
    keys = jax.random.split(key, n_layers)
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[layer_init(k, d_model, d_ff) for k in keys])


def layer_apply(p, x, memory, n_heads, *, tgt_pad_mask=None,
                memory_mask=None, dropout_rate=0.0, rng=None, train=False,
                compute_dtype=None, causal=True):
    """x: (B, L, D) target; memory: (B, T, D) encoder output.

    tgt_pad_mask: (B, L) True where the target position is VALID.
    causal: lower-triangular self-attention (the AED training/decode
      default); False matches the reference's hand-rolled Decoder called
      with trg_mask=None (models/model/decoder.py:30-35, whose masked
      path is the -1e-9 no-op quirk).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2, r3, r4 = jax.random.split(rng, 4)

    y = nn.layer_norm(p["ln1"], x)
    y = nn.mha(p["self_attn"], y, y, n_heads, key_mask=tgt_pad_mask,
               causal=causal, compute_dtype=compute_dtype)
    if train:
        y = nn.dropout(y, dropout_rate, r1, train=True)
    x = x + y

    y = nn.layer_norm(p["ln2"], x)
    y = nn.mha(p["cross_attn"], y, memory, n_heads, key_mask=memory_mask,
               compute_dtype=compute_dtype)
    if train:
        y = nn.dropout(y, dropout_rate, r2, train=True)
    x = x + y

    y = nn.layer_norm(p["ln3"], x)
    y = jax.nn.relu(nn.linear(p["w1"], y, compute_dtype=compute_dtype))
    if train:
        y = nn.dropout(y, dropout_rate, r3, train=True)
    y = nn.linear(p["w2"], y, compute_dtype=compute_dtype)
    if train:
        y = nn.dropout(y, dropout_rate, r4, train=True)
    return x + y


def stack_apply(params, x, memory, n_heads, final_ln, *, tgt_pad_mask=None,
                memory_mask=None, dropout_rate=0.0, rng=None, train=False,
                compute_dtype=None, causal=True):
    """Scan the stacked decoder layers; apply the shared final LayerNorm."""
    n_layers = jax.tree_util.tree_leaves(params)[0].shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, n_layers)

    def body(h, xs):
        p, r = xs
        h = layer_apply(p, h, memory, n_heads, tgt_pad_mask=tgt_pad_mask,
                        memory_mask=memory_mask, dropout_rate=dropout_rate,
                        rng=r, train=train, compute_dtype=compute_dtype,
                        causal=causal)
        return h, None

    x, _ = lax.scan(body, x, (params, rngs))
    return nn.layer_norm(final_ln, x)


# --------------------------------------------------------------------------
# Incremental decoding with KV cache
# --------------------------------------------------------------------------

def init_cache(params, batch: int, max_len: int, d_model: int):
    """Per-layer self-attention K/V cache (n_layers, B, max_len, D)."""
    n_layers = jax.tree_util.tree_leaves(params)[0].shape[0]
    z = jnp.zeros((n_layers, batch, max_len, d_model), jnp.float32)
    return {"k": z, "v": z, "pos": jnp.zeros((), jnp.int32)}


def step_apply(params, x_t, memory, n_heads, final_ln, cache, *,
               compute_dtype=None):
    """One decode step: x_t (B, 1, D) at position cache['pos'].

    Returns (y (B, 1, D) after final LN, new_cache). Self-attention keys
    and values for each layer are appended to the cache so each step is
    O(L) instead of O(L²)."""
    n_layers = jax.tree_util.tree_leaves(params)[0].shape[0]
    B = x_t.shape[0]
    pos = cache["pos"]
    max_len = cache["k"].shape[2]
    valid = jnp.arange(max_len)[None, :] <= pos            # (1, max_len)
    valid = jnp.broadcast_to(valid, (B, max_len))

    new_k, new_v = [], []
    h = x_t
    for li in range(n_layers):
        p = jax.tree_util.tree_map(lambda a: a[li], params)
        y = nn.layer_norm(p["ln1"], h)
        q = nn.linear(p["self_attn"]["q"], y, compute_dtype=compute_dtype)
        k_t = nn.linear(p["self_attn"]["k"], y, compute_dtype=compute_dtype)
        v_t = nn.linear(p["self_attn"]["v"], y, compute_dtype=compute_dtype)
        k_all = lax.dynamic_update_slice(cache["k"][li],
                                         k_t.astype(jnp.float32),
                                         (0, pos, 0))
        v_all = lax.dynamic_update_slice(cache["v"][li],
                                         v_t.astype(jnp.float32),
                                         (0, pos, 0))
        new_k.append(k_all)
        new_v.append(v_all)
        # attention of the single query over cached keys
        D = q.shape[-1]
        dh = D // n_heads
        qh = q.reshape(B, 1, n_heads, dh).transpose(0, 2, 1, 3)
        kh = k_all.reshape(B, max_len, n_heads, dh).transpose(0, 2, 1, 3)
        vh = v_all.reshape(B, max_len, n_heads, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) / (dh ** 0.5)
        scores = jnp.where(valid[:, None, None, :], scores, nn.NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, vh,
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, 1, D)
        h = h + nn.linear(p["self_attn"]["o"], ctx,
                          compute_dtype=compute_dtype)

        y = nn.layer_norm(p["ln2"], h)
        y = nn.mha(p["cross_attn"], y, memory, n_heads,
                   compute_dtype=compute_dtype)
        h = h + y

        y = nn.layer_norm(p["ln3"], h)
        y = jax.nn.relu(nn.linear(p["w1"], y, compute_dtype=compute_dtype))
        y = nn.linear(p["w2"], y, compute_dtype=compute_dtype)
        h = h + y

    out = nn.layer_norm(final_ln, h)
    new_cache = {"k": jnp.stack(new_k), "v": jnp.stack(new_v),
                 "pos": pos + 1}
    return out, new_cache

"""Conformer encoder block, TPU-native.

Capability parity with the reference's encoder layer — torchaudio
``Conformer`` as instantiated in models/model/early_exit.py:603-615 — with a
TPU-first implementation: feature-last layout, params stacked per layer for
`lax.scan`, masked statistics, float32 softmax/normalisation, optional
bfloat16 matmuls.

Block structure (torchaudio ConformerLayer semantics, convolution_first=False):

    x = x + 0.5 * FFN(LN(x))            # macaron half-FFN  (SiLU)
    x = x + Drop(MHSA(LN(x), key_mask))
    x = x + ConvModule(x)               # LN → PW(2d)+GLU → DW(k) → BN → SiLU → PW → Drop
    x = x + 0.5 * FFN(LN(x))
    x = LN(x)

Differences from the reference (intentional, documented):
- BatchNorm statistics exclude padded frames (torchaudio includes them);
  set ``norm="group"`` for a stateless per-sample GroupNorm(1) instead.
- Padded positions are zeroed between blocks so depthwise conv cannot leak
  garbage across the valid/invalid boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from early_exit_tpu.nn import core as nn


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    d_model: int
    n_heads: int
    d_ff: int
    kernel_size: int
    dropout: float = 0.1
    conv_norm: str = "batch"   # "batch" | "group"
    compute_dtype: str = "float32"
    attention_impl: str = "xla"   # "xla" | "pallas"
    remat: bool = False           # rematerialise each block in backward
    residual_dtype: str = "float32"
    attn_softmax_dtype: str = "float32"
    # run inference through the fused whole-block Pallas kernel
    # (ops/pallas/conformer_block.py); training keeps the XLA path
    fused_block: bool = False
    # "int8": W8A8 dynamic quantization of the block's linears at
    # inference (2× MXU rate on v5e); training always runs unquantized
    quantize: str = "none"

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def _quant(self, train: bool):
        return self.quantize if (self.quantize != "none" and not train) \
            else None

    @property
    def rdtype(self):
        return (jnp.bfloat16 if self.residual_dtype == "bfloat16"
                else jnp.float32)

    @property
    def sm_dtype(self):
        return (jnp.bfloat16 if self.attn_softmax_dtype == "bfloat16"
                else jnp.float32)


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _ffn_init(key, d_model, d_ff):
    k1, k2 = jax.random.split(key)
    return {
        "ln": nn.layer_norm_init(d_model),
        "w1": nn.linear_init(k1, d_model, d_ff),
        "w2": nn.linear_init(k2, d_ff, d_model),
    }


def block_init(key: jax.Array, cfg: ConformerConfig):
    """Returns (params, state) for one Conformer block."""
    kf1, ka, kc1, kdw, kc2, kf2 = jax.random.split(key, 6)
    bn_params, bn_state = nn.batch_norm_init(cfg.d_model)
    params = {
        "ffn1": _ffn_init(kf1, cfg.d_model, cfg.d_ff),
        "attn": {"ln": nn.layer_norm_init(cfg.d_model),
                 "mha": nn.mha_init(ka, cfg.d_model)},
        "conv": {
            "ln": nn.layer_norm_init(cfg.d_model),
            "pw1": nn.linear_init(kc1, cfg.d_model, 2 * cfg.d_model),
            "dw": nn.depthwise_conv1d_init(kdw, cfg.d_model, cfg.kernel_size),
            "norm": bn_params,
            "pw2": nn.linear_init(kc2, cfg.d_model, cfg.d_model),
        },
        "ffn2": _ffn_init(kf2, cfg.d_model, cfg.d_ff),
        "final_ln": nn.layer_norm_init(cfg.d_model),
    }
    state = {"conv_bn": bn_state}
    return params, state


def stack_init(key: jax.Array, cfg: ConformerConfig, n_layers: int):
    """n_layers blocks with every leaf stacked on a leading axis."""
    keys = jax.random.split(key, n_layers)
    outs = [block_init(k, cfg) for k in keys]
    params = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                    *[o[0] for o in outs])
    state = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                   *[o[1] for o in outs])
    return params, state


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def _ffn(p, x, cfg: ConformerConfig, rng, train):
    qz = cfg._quant(train)
    y = nn.layer_norm(p["ln"], x)
    y = nn.linear(p["w1"], y, compute_dtype=cfg.dtype, quantize=qz)
    y = jax.nn.silu(y)
    if train:
        rng, r1, r2 = jax.random.split(rng, 3)
        y = nn.dropout(y, cfg.dropout, r1, train=True)
        y = nn.linear(p["w2"], y, compute_dtype=cfg.dtype)
        y = nn.dropout(y, cfg.dropout, r2, train=True)
    else:
        y = nn.linear(p["w2"], y, compute_dtype=cfg.dtype, quantize=qz)
    return y


def _conv_module(p, bn_state, x, mask, cfg: ConformerConfig, rng, train):
    qz = cfg._quant(train)
    y = nn.layer_norm(p["ln"], x)
    y = nn.linear(p["pw1"], y, compute_dtype=cfg.dtype, quantize=qz)  # (B, T, 2d)
    a, b = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(b)                                 # GLU
    if mask is not None:
        y = jnp.where(mask[..., None], y, 0.0)                # no conv leakage
    y = nn.depthwise_conv1d(p["dw"], y, compute_dtype=cfg.dtype)
    if cfg.conv_norm == "batch":
        y, new_bn = nn.masked_batch_norm(p["norm"], bn_state, y, mask,
                                         train=train)
    else:
        # GroupNorm(num_groups=1) over (T, C) per sample, masked
        y32 = y.astype(jnp.float32)
        if mask is not None:
            m = mask.astype(jnp.float32)[..., None]
            cnt = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True), 1.0) \
                * y32.shape[-1]
            mean = jnp.sum(y32 * m, axis=(1, 2), keepdims=True) / cnt
            var = jnp.sum(jnp.square(y32 - mean) * m, axis=(1, 2),
                          keepdims=True) / cnt
        else:
            mean = jnp.mean(y32, axis=(1, 2), keepdims=True)
            var = jnp.var(y32, axis=(1, 2), keepdims=True)
        y = (y32 - mean) * lax.rsqrt(var + 1e-5) * p["norm"]["g"] + p["norm"]["b"]
        new_bn = bn_state
    y = jax.nn.silu(y)
    y = nn.linear(p["pw2"], y, compute_dtype=cfg.dtype, quantize=qz)
    if train:
        y = nn.dropout(y, cfg.dropout, rng, train=True)
    return y, new_bn


def block_apply(params, state, x, mask, cfg: ConformerConfig, *,
                rng: Optional[jax.Array] = None, train: bool = False,
                attn_mask: Optional[jax.Array] = None):
    """One Conformer block on (B, T, D). mask: (B, T) bool validity.

    attn_mask: optional (T, T) bool — True where q may attend to k
    (dynamic-chunk streaming training; the conv module stays local and
    needs no masking beyond validity).

    Returns (y, new_state)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_ffn1, r_attn, r_conv, r_ffn2 = jax.random.split(rng, 4)

    # the residual stream lives in cfg.rdtype (bf16 halves HBM traffic);
    # norms/softmax inside sublayers still compute in float32
    rd = cfg.rdtype
    x = x.astype(rd)
    x = x + 0.5 * _ffn(params["ffn1"], x, cfg, r_ffn1, train).astype(rd)

    y = nn.layer_norm(params["attn"]["ln"], x)
    if cfg.attention_impl == "pallas" and attn_mask is None:
        from early_exit_tpu.ops.pallas import attention as pattn
        y = pattn.mha_pallas(params["attn"]["mha"], y, cfg.n_heads,
                             key_mask=mask, compute_dtype=cfg.dtype)
    else:
        y = nn.mha(params["attn"]["mha"], y, y, cfg.n_heads, key_mask=mask,
                   pair_mask=attn_mask,
                   compute_dtype=cfg.dtype, softmax_dtype=cfg.sm_dtype,
                   quantize=cfg._quant(train))
    if train:
        y = nn.dropout(y, cfg.dropout, r_attn, train=True)
    x = x + y.astype(rd)

    y, new_bn = _conv_module(params["conv"], state["conv_bn"], x, mask,
                             cfg, r_conv, train)
    x = x + y.astype(rd)

    x = x + 0.5 * _ffn(params["ffn2"], x, cfg, r_ffn2, train).astype(rd)
    x = nn.layer_norm(params["final_ln"], x).astype(rd)
    if mask is not None:
        x = jnp.where(mask[..., None], x, jnp.zeros((), rd))
    return x, {"conv_bn": new_bn}


def stack_apply(params, state, x, mask, cfg: ConformerConfig, *,
                rng: Optional[jax.Array] = None, train: bool = False,
                collect_outputs: bool = False, collect_every: int = 1,
                attn_mask: Optional[jax.Array] = None):
    """Run a stack of blocks whose params are leading-axis stacked, via
    `lax.scan` (compiles the block body once regardless of depth).

    attn_mask: optional (T, T) bool pair mask applied in every block's
    self-attention (dynamic-chunk training; forces the XLA path).

    collect_every=k (with collect_outputs) stacks only every k-th
    layer's output — what the early-exit trunk needs; stacking all L
    layers and `take`-ing the E exit layers back out costs an extra
    (L, B, T, D) HBM write plus (L+E, B, T, D) of read/write traffic.

    Returns (y, new_state[, per_layer_outputs])."""
    # the fused kernel keeps per-item (Tp, Tp) scores + the whole block
    # resident in VMEM; beyond ~T=512 that no longer fits, fall back
    if (cfg.fused_block and not train and x.shape[1] <= 512
            and attn_mask is None):
        from early_exit_tpu.ops.pallas import conformer_block as fcb
        if mask is not None:
            lengths = jnp.sum(mask.astype(jnp.int32), axis=1)
        else:
            lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
        return fcb.fused_stack_apply(params, state, x, lengths, cfg,
                                     collect_outputs=collect_outputs,
                                     collect_every=collect_every)

    n_layers = jax.tree_util.tree_leaves(params)[0].shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    layer_rngs = jax.random.split(rng, n_layers)

    block_fn = block_apply
    if cfg.remat:
        # trade FLOPs for HBM: recompute block activations in the backward
        # pass (jax.checkpoint) — the TPU-native answer to deep stacks
        block_fn = jax.checkpoint(
            lambda p, s, h, m, r: block_apply(p, s, h, m, cfg, rng=r,
                                              train=train,
                                              attn_mask=attn_mask),
            static_argnums=())
        def body(carry, xs):   # noqa: F811
            h = carry
            p, s, r = xs
            h, new_s = block_fn(p, s, h, mask, r)
            out = h if collect_outputs else None
            return h, (new_s, out)
        y, (new_state, outs) = lax.scan(body, x,
                                        (params, state, layer_rngs))
        if collect_outputs:
            if collect_every > 1:   # exit layers only, as the fused path
                outs = outs[collect_every - 1::collect_every]
            return y, new_state, outs
        return y, new_state

    def body(carry, xs):
        h = carry
        p, s, r = xs
        h, new_s = block_apply(p, s, h, mask, cfg, rng=r, train=train,
                               attn_mask=attn_mask)
        out = h if collect_outputs else None
        return h, (new_s, out)

    y, (new_state, outs) = lax.scan(body, x, (params, state, layer_rngs))
    if collect_outputs:
        if collect_every > 1:
            outs = outs[collect_every - 1::collect_every]
        return y, new_state, outs
    return y, new_state

"""Functional neural-net primitives for TPU (pure JAX).

Design notes
------------
Parameters are plain pytrees (nested dicts of ``jnp.ndarray``). Every layer
is an ``*_init(key, ...) -> params`` / ``fn(params, x, ...) -> y`` pair; no
module objects, no tracing magic. This keeps models trivially compatible
with `jax.jit`, `jax.vmap`-stacked layer weights, `lax.scan` over layers,
`jax.sharding` param annotations, and Pallas kernel substitution.

Dtype policy: parameters are stored float32; matmul-heavy ops accept a
``compute_dtype`` (bfloat16 on TPU by default at the model level) and
normalisations / softmax always run in float32.

Reference parity notes cite ``augustgw/early-exit-transformer`` files as
``file:line`` (mounted read-only at /root/reference) — behavior only, the
implementation here is TPU-native and written from scratch.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

Param = Dict[str, Any]

# Large negative used for masking logits before softmax. Kept finite so that
# fully-masked rows produce a uniform distribution instead of NaN.
NEG_INF = -1e9


# --------------------------------------------------------------------------
# Initializers
# --------------------------------------------------------------------------

def xavier_uniform(key: jax.Array, shape, dtype=jnp.float32,
                   fan_in: Optional[int] = None, fan_out: Optional[int] = None):
    """Xavier/Glorot uniform — parity with the reference's global weight init
    (torch.nn.init.xavier_uniform_, util/model_utils.py:10-12)."""
    if fan_in is None:
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
    if fan_out is None:
        fan_out = shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def lecun_normal(key: jax.Array, shape, dtype=jnp.float32,
                 fan_in: Optional[int] = None):
    if fan_in is None:
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
    std = 1.0 / math.sqrt(fan_in)
    return std * jax.random.normal(key, shape, dtype)


# --------------------------------------------------------------------------
# Linear
# --------------------------------------------------------------------------

def linear_init(key: jax.Array, d_in: int, d_out: int, *, bias: bool = True) -> Param:
    p = {"w": xavier_uniform(key, (d_in, d_out))}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def quantize_int8(x: jax.Array, axis: int = -1):
    """Symmetric dynamic int8 quantization along `axis`.

    Returns (q int8, scale f32 with keepdims) such that q * scale ≈ x.
    Scales are per-slice absmax/127 — per-token for activations
    (axis=-1, the reduction dim) and per-output-channel for weights
    (axis=0), the standard W8A8 dynamic-quantization recipe."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x32 / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _linear_int8(p: Param, x: jax.Array, *, compute_dtype=None) -> jax.Array:
    """W8A8 dynamically-quantized linear: int8×int8→int32 on the MXU.

    TPU v5e runs int8 matmuls at 2× the bf16 rate (394 vs 197 TOPS);
    quantizing both operands on the fly (per-token activation scales,
    per-channel weight scales) keeps the rescale exact up to rounding.
    Inference only — `round` has zero gradient."""
    xq, sx = quantize_int8(x, axis=-1)            # (..., d_in), (..., 1)
    wq, sw = quantize_int8(p["w"], axis=0)        # (d_in, d_out), (1, d_out)
    y = lax.dot_general(xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * sw.reshape((1,) * (y.ndim - 1) + (-1,)))
    if "b" in p:
        y = y + p["b"]
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y


def linear(p: Param, x: jax.Array, *, compute_dtype=None,
           quantize: Optional[str] = None) -> jax.Array:
    """y = x @ w + b in `compute_dtype` (output included: materialising
    fp32 activations around bf16 matmuls doubles HBM traffic and costs
    ~40% of forward time; the MXU still accumulates in fp32 internally).
    Callers needing fp32 — softmax/log-prob heads — upcast explicitly.

    quantize="int8" routes through the W8A8 dynamic-quantization path
    (inference only; see _linear_int8)."""
    if quantize == "int8":
        return _linear_int8(p, x, compute_dtype=compute_dtype)
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# --------------------------------------------------------------------------
# Conv1d (feature-last: x is (B, T, C))
# --------------------------------------------------------------------------

def conv1d_init(key: jax.Array, c_in: int, c_out: int, kernel: int,
                *, bias: bool = True) -> Param:
    # weight layout (kernel, c_in, c_out) for lax dimension_numbers WIO
    w = xavier_uniform(key, (kernel, c_in, c_out),
                       fan_in=c_in * kernel, fan_out=c_out * kernel)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def conv1d(p: Param, x: jax.Array, *, stride: int = 1,
           padding: str | int = "VALID", compute_dtype=None) -> jax.Array:
    """1-D convolution over the time axis of a (B, T, C) tensor.

    The conv output stays in the compute dtype and is cast to float32
    explicitly afterwards: a float32 `preferred_element_type` on bfloat16
    operands makes the autodiff transpose conv see mixed dtypes, which
    lax.conv rejects (an explicit cast transposes to a cast instead)."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if isinstance(padding, int):
        pad = [(padding, padding)]
    elif padding == "SAME":
        k = w.shape[0]
        pad = [((k - 1) // 2, k // 2)]
    else:
        pad = "VALID"
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=pad,
        dimension_numbers=("NWC", "WIO", "NWC"),
    ).astype(jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


def depthwise_conv1d_init(key: jax.Array, channels: int, kernel: int,
                          *, bias: bool = True) -> Param:
    # (kernel, 1, channels) with feature_group_count=channels
    w = xavier_uniform(key, (kernel, 1, channels), fan_in=kernel, fan_out=kernel)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((channels,), jnp.float32)
    return p


@jax.custom_vjp
def _dwconv_core(x: jax.Array, w: jax.Array) -> jax.Array:
    """Depthwise 'SAME' conv over time: x (B, T, C), w (k, 1, C).

    Hand-written VJP: XLA's SPMD partitioner mis-scales the weight-grad of
    `feature_group_count` convolutions by the size of mesh axes the operands
    are *replicated* over (reproduced on jax 0.9.0: grad is exactly
    n_model_axis times too large on a (data, model) mesh). The backward pass
    below uses only elementwise multiplies + reductions, which partition
    correctly.
    """
    k = w.shape[0]
    return lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[((k - 1) // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1],
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _dwconv_fwd(x, w):
    return _dwconv_core(x, w), (x, w)


def _dwconv_bwd(res, g):
    x, w = res
    k = w.shape[0]
    pl, pr = (k - 1) // 2, k // 2
    # dx = depthwise conv of g with the time-flipped kernel, swapped padding
    wf = jnp.flip(w, axis=0)
    dx = lax.conv_general_dilated(
        g.astype(x.dtype), wf, window_strides=(1,), padding=[(pr, pl)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1],
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # dw[j, 0, c] = sum_{b,t} g[b, t, c] * x[b, t + j - pl, c]
    T = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (pl, pr), (0, 0)))
    g32 = g.astype(jnp.float32)
    taps = [jnp.sum(g32 * xp[:, j:j + T, :].astype(jnp.float32), axis=(0, 1))
            for j in range(k)]
    dw = jnp.stack(taps)[:, None, :].astype(w.dtype)
    return dx, dw


_dwconv_core.defvjp(_dwconv_fwd, _dwconv_bwd)


def depthwise_conv1d(p: Param, x: jax.Array, *, compute_dtype=None) -> jax.Array:
    """Depthwise 'SAME' conv over time of (B, T, C) — the Conformer
    convolution-module kernel (torchaudio Conformer depthwise conv,
    models/model/early_exit.py:610 `depthwise_conv_kernel_size`)."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = _dwconv_core(x, w).astype(jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


# --------------------------------------------------------------------------
# Normalisation
# --------------------------------------------------------------------------

def layer_norm_init(d: int) -> Param:
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def layer_norm(p: Param, x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return y * p["g"] + p["b"]


def batch_norm_init(d: int) -> tuple[Param, Param]:
    """Returns (params, state). State holds running stats (torch BatchNorm1d
    semantics: momentum 0.1, eps 1e-5 — used by torchaudio's Conformer conv
    module, see SURVEY.md §2 Early_conformer)."""
    params = {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}
    state = {"mean": jnp.zeros((d,), jnp.float32),
             "var": jnp.ones((d,), jnp.float32)}
    return params, state


def masked_batch_norm(p: Param, state: Param, x: jax.Array,
                      mask: Optional[jax.Array], *, train: bool,
                      momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm over (batch, time) per channel of (B, T, C), counting only
    valid frames. The reference's BatchNorm1d includes padded frames in the
    statistics (a known torchaudio quirk); masking is the correct behavior
    and is our default.

    Returns (y, new_state)."""
    x32 = x.astype(jnp.float32)
    if train:
        if mask is not None:
            m = mask.astype(jnp.float32)[..., None]       # (B, T, 1)
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x32 * m, axis=(0, 1)) / count
            var = jnp.sum(jnp.square(x32 - mean) * m, axis=(0, 1)) / count
            # unbiased var for the running estimate (torch semantics)
            unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
        else:
            mean = jnp.mean(x32, axis=(0, 1))
            var = jnp.var(x32, axis=(0, 1))
            n = x32.shape[0] * x32.shape[1]
            unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x32 - mean) * lax.rsqrt(var + eps) * p["g"] + p["b"]
    return y, new_state


# --------------------------------------------------------------------------
# Embedding
# --------------------------------------------------------------------------

def embedding_init(key: jax.Array, vocab: int, d: int) -> Param:
    return {"table": jax.random.normal(key, (vocab, d)) }


def embedding_lookup(p: Param, ids: jax.Array) -> jax.Array:
    return jnp.take(p["table"], ids, axis=0)


# --------------------------------------------------------------------------
# Dropout
# --------------------------------------------------------------------------

def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array], *,
            train: bool) -> jax.Array:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# --------------------------------------------------------------------------
# Multi-head attention
# --------------------------------------------------------------------------

def mha_init(key: jax.Array, d_model: int, *, bias: bool = True) -> Param:
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": linear_init(kq, d_model, d_model, bias=bias),
        "k": linear_init(kk, d_model, d_model, bias=bias),
        "v": linear_init(kv, d_model, d_model, bias=bias),
        "o": linear_init(ko, d_model, d_model, bias=bias),
    }


def mha(p: Param, q_in: jax.Array, kv_in: jax.Array, n_heads: int, *,
        key_mask: Optional[jax.Array] = None,
        causal: bool = False,
        attn_bias: Optional[jax.Array] = None,
        pair_mask: Optional[jax.Array] = None,
        compute_dtype=None,
        softmax_dtype=jnp.float32,
        quantize: Optional[str] = None) -> jax.Array:
    """Multi-head attention on (B, Tq, D) / (B, Tk, D).

    key_mask: (B, Tk) bool — True where the key position is valid.
    causal: apply a lower-triangular mask (decoder self-attention,
      early_exit.py:807-811 `create_tgt_mask` parity).
    attn_bias: optional additive (B|1, H|1, Tq, Tk) bias.
    pair_mask: optional (Tq, Tk) or (B, Tq, Tk) bool — True where q may
      attend to k (dynamic-chunk streaming training).
    softmax_dtype: dtype of the materialised score/probability tensors —
      the (B, H, Tq, Tk) buffers dominate attention HBM traffic, so
      bfloat16 here buys ~20% forward time at inference; keep float32
      for training numerics.
    """
    B, Tq, D = q_in.shape
    Tk = kv_in.shape[1]
    dh = D // n_heads

    q = linear(p["q"], q_in, compute_dtype=compute_dtype, quantize=quantize)
    k = linear(p["k"], kv_in, compute_dtype=compute_dtype, quantize=quantize)
    v = linear(p["v"], kv_in, compute_dtype=compute_dtype, quantize=quantize)

    q = q.reshape(B, Tq, n_heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, Tk, n_heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, Tk, n_heads, dh).transpose(0, 2, 1, 3)

    lowp = softmax_dtype == jnp.bfloat16
    if lowp:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
        neg = jnp.asarray(-30000.0, scores.dtype)   # representable in bf16
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(dh)
        neg = NEG_INF

    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :], scores, neg)
    if causal:
        cm = jnp.tril(jnp.ones((Tq, Tk), bool))
        scores = jnp.where(cm[None, None], scores, neg)
    if pair_mask is not None:
        pm = pair_mask if pair_mask.ndim == 3 else pair_mask[None]
        scores = jnp.where(pm[:, None], scores, neg)
    if attn_bias is not None:
        scores = scores + attn_bias.astype(scores.dtype)

    if lowp:
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    else:
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if compute_dtype is not None:
            attn = attn.astype(compute_dtype)
            v = v.astype(compute_dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, Tq, D)
    return linear(p["o"], out, compute_dtype=compute_dtype, quantize=quantize)


# --------------------------------------------------------------------------
# Sinusoidal positional encoding
# --------------------------------------------------------------------------

def sinusoidal_pe(max_len: int, d_model: int) -> jax.Array:
    """(max_len, d_model) sinusoidal table — parity with the reference
    PositionalEncoding (models/embedding/positional_encoding.py:55-73)."""
    return sinusoidal_pe_at(jnp.arange(max_len), d_model)


def sinusoidal_pe_at(positions: jax.Array, d_model: int) -> jax.Array:
    """Sinusoidal encodings at arbitrary (possibly traced) positions —
    (len(positions), d_model). Used by streaming windows to place a
    window at its GLOBAL stream offset (serving/streaming.py)."""
    pos = positions.astype(jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((pos.shape[0], d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


# --------------------------------------------------------------------------
# Stacked-layer init helper
# --------------------------------------------------------------------------

def stack_init(init_fn, key: jax.Array, n: int):
    """Initialise `n` identical layers and stack each leaf along a new
    leading axis, for `lax.scan` over layers (weights live as one array per
    leaf — the TPU-native analogue of the reference's nn.ModuleList loops,
    e.g. early_exit.py:603-615)."""
    keys = jax.random.split(key, n)
    per_layer = [init_fn(k) for k in keys]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)

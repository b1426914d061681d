"""Pallas fused Conformer block (TPU) — the SURVEY §7 flagship kernel.

One `pallas_call` runs a whole Conformer block for one batch item with
every intermediate resident in VMEM: macaron FFN half → MHSA (all heads)
→ convolution module (GLU, depthwise conv, folded BatchNorm, SiLU) →
second FFN half → final LayerNorm. The XLA path writes the residual
stream (and the FFN/GLU intermediates) to HBM between fusions ~10× per
block; here the stream crosses HBM exactly twice (x in, y out) and the
weights once.

Inference-only by design (no dropout; BatchNorm running stats are folded
into scale/shift on the host). Training keeps the XLA path, whose
backward pass XLA already fuses well. Numerics mirror
`models/conformer.block_apply` (train=False) op for op — fp32 LayerNorm /
BatchNorm, cfg.compute_dtype matmuls with fp32 MXU accumulation,
cfg.attn_softmax_dtype scores, cfg.residual_dtype stream — with one
deliberate exception: LayerNorm variance uses the one-pass
E[x²]−µ² form (≤1 bf16-ulp output difference, −0.77 ms on the
12-block stack; BENCH_NOTES.md ablation table).

Replaces the reference's torchaudio ConformerLayer forward
(models/model/early_exit.py:603-615) on the inference hot path.
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

# flat parameter order for the kernel's weight refs (after x, lengths)
PARAM_ORDER = (
    "ffn1_ln_g", "ffn1_ln_b", "ffn1_w1", "ffn1_b1", "ffn1_w2", "ffn1_b2",
    "attn_ln_g", "attn_ln_b", "wq", "bq", "wk", "bk", "wv", "bv",
    "wo", "bo",
    "conv_ln_g", "conv_ln_b", "pw1_w", "pw1_b", "dw_w", "dw_b",
    "bn_scale", "bn_shift", "pw2_w", "pw2_b",
    "ffn2_ln_g", "ffn2_ln_b", "ffn2_w1", "ffn2_b1", "ffn2_w2", "ffn2_b2",
    "final_ln_g", "final_ln_b",
)

# the matmul weights that get an int8 twin + per-output-channel scale in
# the W8A8 kernel variant (attention score/AV and the depthwise conv stay
# in the float path — they are a small fraction of the MACs)
_MATMUL_WEIGHTS = ("ffn1_w1", "ffn1_w2", "wq", "wk", "wv", "wo",
                   "pw1_w", "pw2_w", "ffn2_w1", "ffn2_w2")

# int8 layout: every matmul weight is followed by its scale row
PARAM_ORDER_INT8 = tuple(
    n for name in PARAM_ORDER
    for n in ((name, name + "_s") if name in _MATMUL_WEIGHTS else (name,)))


def fold_block_params(params, state, *, compute_dtype=jnp.bfloat16,
                      eps: float = 1e-5, quantize: str | None = None):
    """Flatten one block's (params, state) into the kernel layout.

    Matmul weights/biases are cast to the compute dtype (they are cast
    there per-call on the XLA path anyway); LayerNorm vectors stay fp32;
    BatchNorm running stats fold into fp32 scale/shift. Works on stacked
    (leading layer axis) params too — every op is per-leaf.

    quantize="int8": every matmul weight is emitted as a symmetric int8
    tensor plus its per-output-channel fp32 scale row (PARAM_ORDER_INT8
    layout) for the W8A8 kernel variant; biases stay fp32 (applied after
    the int32->fp32 rescale).
    """
    cd = compute_dtype

    def vec(a):      # (..., D) fp32 vector -> (..., 1, D)
        return a[..., None, :].astype(jnp.float32)

    if quantize == "int8":
        # matmul weights are replaced by int8 twins below and their
        # biases stay fp32 (added after the int32->fp32 rescale) — skip
        # the compute-dtype casts that would be built only to be
        # discarded
        mw, cvec = (lambda a: a), vec
    else:
        mw = lambda a: a.astype(cd)

        def cvec(a):     # bias in compute dtype -> (..., 1, F)
            return a[..., None, :].astype(cd)

    bn_g = params["conv"]["norm"]["g"].astype(jnp.float32)
    bn_b = params["conv"]["norm"]["b"].astype(jnp.float32)
    bn_mean = state["conv_bn"]["mean"].astype(jnp.float32)
    bn_var = state["conv_bn"]["var"].astype(jnp.float32)
    bn_scale = bn_g * jax.lax.rsqrt(bn_var + eps)
    bn_shift = bn_b - bn_mean * bn_scale

    dw_w = params["conv"]["dw"]["w"]          # (..., k, 1, D)
    dw_w = dw_w.reshape(dw_w.shape[:-3] + (dw_w.shape[-3],
                                           dw_w.shape[-1])).astype(cd)

    out = {
        "ffn1_ln_g": vec(params["ffn1"]["ln"]["g"]),
        "ffn1_ln_b": vec(params["ffn1"]["ln"]["b"]),
        "ffn1_w1": mw(params["ffn1"]["w1"]["w"]),
        "ffn1_b1": cvec(params["ffn1"]["w1"]["b"]),
        "ffn1_w2": mw(params["ffn1"]["w2"]["w"]),
        "ffn1_b2": cvec(params["ffn1"]["w2"]["b"]),
        "attn_ln_g": vec(params["attn"]["ln"]["g"]),
        "attn_ln_b": vec(params["attn"]["ln"]["b"]),
        "wq": mw(params["attn"]["mha"]["q"]["w"]),
        "bq": cvec(params["attn"]["mha"]["q"]["b"]),
        "wk": mw(params["attn"]["mha"]["k"]["w"]),
        "bk": cvec(params["attn"]["mha"]["k"]["b"]),
        "wv": mw(params["attn"]["mha"]["v"]["w"]),
        "bv": cvec(params["attn"]["mha"]["v"]["b"]),
        "wo": mw(params["attn"]["mha"]["o"]["w"]),
        "bo": cvec(params["attn"]["mha"]["o"]["b"]),
        "conv_ln_g": vec(params["conv"]["ln"]["g"]),
        "conv_ln_b": vec(params["conv"]["ln"]["b"]),
        "pw1_w": mw(params["conv"]["pw1"]["w"]),
        "pw1_b": cvec(params["conv"]["pw1"]["b"]),
        "dw_w": dw_w,
        "dw_b": vec(params["conv"]["dw"]["b"]),
        "bn_scale": vec(bn_scale),
        "bn_shift": vec(bn_shift),
        "pw2_w": mw(params["conv"]["pw2"]["w"]),
        "pw2_b": cvec(params["conv"]["pw2"]["b"]),
        "ffn2_ln_g": vec(params["ffn2"]["ln"]["g"]),
        "ffn2_ln_b": vec(params["ffn2"]["ln"]["b"]),
        "ffn2_w1": mw(params["ffn2"]["w1"]["w"]),
        "ffn2_b1": cvec(params["ffn2"]["w1"]["b"]),
        "ffn2_w2": mw(params["ffn2"]["w2"]["w"]),
        "ffn2_b2": cvec(params["ffn2"]["w2"]["b"]),
        "final_ln_g": vec(params["final_ln"]["g"]),
        "final_ln_b": vec(params["final_ln"]["b"]),
    }
    if quantize != "int8":
        return tuple(out[k] for k in PARAM_ORDER)

    # W8A8 layout: quantize each matmul weight from its RAW fp32 value
    # (mw was the identity above, so out[name] holds it un-rounded)
    # along the reduction axis; matmul biases are already fp32 (cvec
    # aliased vec above) and are added after the int32->fp32 rescale
    for name in _MATMUL_WEIGHTS:
        w32 = out[name].astype(jnp.float32)              # (..., K, N)
        amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)  # (..., 1, N)
        out[name] = jnp.clip(jnp.round(w32 / scale),
                             -127.0, 127.0).astype(jnp.int8)
        out[name + "_s"] = scale
    return tuple(out[k] for k in PARAM_ORDER_INT8)


def _silu(v):
    """SiLU with dtype-explicit constants (Mosaic rejects jax.nn.silu's
    f32 constant broadcasts into bf16 vectors)."""
    one = jnp.asarray(1.0, v.dtype)
    return v / (one + jnp.exp(-v))


def _sigmoid(v):
    one = jnp.asarray(1.0, v.dtype)
    return one / (one + jnp.exp(-v))


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _block_kernel(x_ref, len_ref, *refs, n_heads, kernel_size, cdtype,
                  rdtype, smdtype, group, quantize=None, eps=1e-5,
                  ablate=frozenset()):
    """One grid step processes `group` batch items: LN/matmuls run on the
    flattened (group*Tp, D) rows (big MXU shapes); attention and the
    depthwise conv, which must not mix items, loop per item.

    quantize="int8": matmul weights arrive pre-quantized (int8 + scale
    rows, PARAM_ORDER_INT8); activations are quantized per row in-kernel
    and the dots run int8×int8→int32 (2× the bf16 MXU rate on v5e).

    ablate: PROFILING ONLY (tools/ablate_fused_block.py) — component
    names whose compute is skipped so hardware time can be attributed by
    differencing; output values are wrong when non-empty."""
    order = PARAM_ORDER_INT8 if quantize == "int8" else PARAM_ORDER
    w = dict(zip(order, refs[:-1]))
    o_ref = refs[-1]

    G, Tp, D = x_ref.shape
    R = G * Tp
    dh = D // n_heads
    base = pl.program_id(0) * G
    lengths = [len_ref[base + g, 0] for g in range(G)]

    t_iota = jax.lax.broadcasted_iota(jnp.int32, (Tp, 1), 0)
    row_valid = jnp.concatenate(
        [t_iota < lengths[g] for g in range(G)], axis=0)     # (R, 1)

    def ln(v, g_ref, b_ref):
        v32 = v.astype(jnp.float32)
        if "ln" in ablate:                       # profiling: scale/shift only
            return v32 * g_ref[:] + b_ref[:]
        if "ln2p" in ablate:                     # profiling: two-pass stats
            mu = jnp.mean(v32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(v32 - mu), axis=-1, keepdims=True)
            return ((v32 - mu) * jax.lax.rsqrt(var + eps)
                    * g_ref[:] + b_ref[:])
        # one-pass stats (var = E[x^2] - mu^2): one fewer traversal of the
        # (R, D) fp32 stream than the centered two-pass form — measured
        # -0.77 ms on the 12-block stack at B=128, <=1 bf16 ulp output
        # difference (inputs are bf16-rounded residuals, so the
        # cancellation risk of the uncentered form is bounded)
        mu = jnp.mean(v32, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(v32), axis=-1, keepdims=True)
            - jnp.square(mu), 0.0)
        return (v32 - mu) * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]

    def matmul(v, wname, bname):
        if quantize == "int8":
            v32 = v.astype(jnp.float32)
            amax = jnp.max(jnp.abs(v32), axis=-1, keepdims=True)
            sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
            xq = jnp.clip(jnp.round(v32 / sx),
                          -127.0, 127.0).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, w[wname][:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (sx * w[wname + "_s"][:]) \
                + w[bname][:]
            return y.astype(cdtype)
        y = jnp.dot(v.astype(cdtype), w[wname][:],
                    preferred_element_type=jnp.float32).astype(cdtype)
        return y + w[bname][:]

    def ffn(v, pre):
        y = ln(v, w[pre + "_ln_g"], w[pre + "_ln_b"])
        y = matmul(y, pre + "_w1", pre + "_b1")
        if "silu" not in ablate:
            y = _silu(y)
        return matmul(y, pre + "_w2", pre + "_b2")

    x = x_ref[:].reshape(R, D).astype(rdtype)

    # ---- macaron FFN half
    half = jnp.asarray(0.5, rdtype)
    if "ffn" not in ablate:
        x = x + half * ffn(x, "ffn1").astype(rdtype)

    # ---- MHSA, all heads in VMEM; per-item score/softmax
    if "attn" not in ablate:
        y = ln(x, w["attn_ln_g"], w["attn_ln_b"])
        q = matmul(y, "wq", "bq")
        k = matmul(y, "wk", "bk")
        v = matmul(y, "wv", "bv")
        scale = 1.0 / math.sqrt(dh)
        lowp = smdtype == jnp.bfloat16
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
        items = []
        for g in range(G):
            rows = slice(g * Tp, (g + 1) * Tp)
            col_valid = c_iota < lengths[g]
            heads = []
            for h in range(n_heads):
                sl = slice(h * dh, (h + 1) * dh)
                qh, kh, vh = q[rows, sl], k[rows, sl], v[rows, sl]
                s = jax.lax.dot_general(
                    qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (Tp, Tp)
                if lowp:
                    s = s.astype(smdtype) * jnp.asarray(scale, smdtype)
                    s = jnp.where(col_valid, s,
                                  jnp.asarray(-30000.0, smdtype))
                    if "softmax" in ablate:
                        p = s
                    elif "divlate" in ablate:
                        # profiling: unnormalized exp through the AV dot,
                        # divide on the (Tp, dh) output instead of the
                        # (Tp, Tp) probs
                        m = jnp.max(s, axis=-1, keepdims=True)
                        e = jnp.exp(s - m)
                        z = jnp.sum(e, axis=-1, keepdims=True)
                        oh = jnp.dot(e, vh,
                                     preferred_element_type=jnp.float32)
                        oh = (oh / z.astype(jnp.float32)).astype(cdtype)
                        heads.append(oh)
                        continue
                    else:
                        p = _softmax(s)
                    oh = jnp.dot(p, vh, preferred_element_type=jnp.float32
                                 ).astype(cdtype)
                else:
                    s = s * scale
                    s = jnp.where(col_valid, s, -1e9)
                    p = (s if "softmax" in ablate
                         else _softmax(s)).astype(cdtype)
                    oh = jnp.dot(p, vh.astype(cdtype),
                                 preferred_element_type=jnp.float32)
                heads.append(oh)
            items.append(jnp.concatenate(heads, axis=-1))    # (Tp, D)
        attn_out = jnp.concatenate(items, axis=0)            # (R, D)
        x = x + matmul(attn_out, "wo", "bo").astype(rdtype)

    # ---- convolution module
    if "conv" not in ablate:
        y = ln(x, w["conv_ln_g"], w["conv_ln_b"])
        y = matmul(y, "pw1_w", "pw1_b")                      # (R, 2D)
        a, b = y[:, :D], y[:, D:]
        y = a if "glu" in ablate else a * _sigmoid(b)        # GLU, cdtype
        y = jnp.where(row_valid, y, jnp.zeros((), cdtype))   # no leakage
        # depthwise 'SAME' conv over time, per item: k shifted
        # multiply-adds (VPU), fp32 accumulation then one cast to cdtype
        # (matches the XLA conv's preferred_element_type=f32 ->
        # astype(bf16) rounding)
        if "dwconv" in ablate:
            y = y.astype(jnp.float32)
        else:
            kpad_l = (kernel_size - 1) // 2
            dw = w["dw_w"][:].astype(jnp.float32)            # (k, D)
            # vectorized over items: pad each item's time axis inside the
            # (G, Tp, D) view so taps never mix items; one tap loop, no
            # per-item concat (the concat form scheduled ~10x slower in
            # situ — BENCH_NOTES.md round-3 ablation)
            y3 = y.reshape(G, Tp, D)
            y3p = jnp.pad(y3, ((0, 0),
                               (kpad_l, kernel_size - 1 - kpad_l),
                               (0, 0)))
            adt = cdtype if "dwbf16" in ablate else jnp.float32
            if "dwpre" in ablate:        # profiling: one upfront f32 convert
                y3p = y3p.astype(adt)
            acc = jnp.zeros((G, Tp, D), adt)
            for j in range(kernel_size):
                acc = acc + (y3p[:, j:j + Tp].astype(adt)
                             * dw[j:j + 1, :][None].astype(adt))
            y = acc.reshape(R, D)
            y = y.astype(cdtype).astype(jnp.float32)         # (R, D) f32
        y = y + w["dw_b"][:]
        y = y * w["bn_scale"][:] + w["bn_shift"][:]          # folded BN
        if "silu" not in ablate:
            y = _silu(y)
        y = matmul(y, "pw2_w", "pw2_b")
        x = x + y.astype(rdtype)

    # ---- second FFN half + final LN
    if "ffn" not in ablate:
        x = x + half * ffn(x, "ffn2").astype(rdtype)
    x = ln(x, w["final_ln_g"], w["final_ln_b"]).astype(rdtype)
    x = jnp.where(row_valid, x, jnp.zeros((), rdtype))
    o_ref[:] = x.reshape(G, Tp, D)


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("n_heads", "kernel_size",
                                             "compute_dtype",
                                             "residual_dtype",
                                             "attn_softmax_dtype",
                                             "group", "interpret",
                                             "quantize", "ablate"))
def fused_block_apply(folded, x, lengths, *, n_heads: int,
                      kernel_size: int, compute_dtype=jnp.bfloat16,
                      residual_dtype=jnp.bfloat16,
                      attn_softmax_dtype=jnp.float32,
                      group: int | None = None,
                      interpret: bool = False,
                      quantize: str | None = None,
                      ablate: frozenset = frozenset()):
    """One fused Conformer block. x: (B, T, D); lengths: (B,) int32.

    folded: tuple from fold_block_params (unstacked). group: batch items
    per grid step (bigger MXU matmuls vs VMEM/code size; group=2 measured
    fastest at reference shapes on v5e — BENCH_NOTES.md). Returns
    (B, T, D) in residual_dtype."""
    B, T, D = x.shape
    Tp = _pad_to(T, 128)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    if group is None:
        group = 2 if B >= 2 else 1
    group = min(group, B)
    Bp = _pad_to(B, group)
    if Bp != B:   # padded items carry length 0 -> fully masked
        x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0)))
        lengths = jnp.pad(lengths, (0, Bp - B))

    kern = functools.partial(
        _block_kernel, n_heads=n_heads, kernel_size=kernel_size,
        cdtype=compute_dtype, rdtype=residual_dtype,
        smdtype=attn_softmax_dtype, group=group, quantize=quantize,
        ablate=ablate)

    w_specs = [
        pl.BlockSpec(a.shape, (lambda *_, n=a.ndim: (0,) * n),
                     memory_space=pltpu.VMEM)
        for a in folded
    ]
    y = pl.pallas_call(
        kern,
        grid=(Bp // group,),
        in_specs=[
            pl.BlockSpec((group, Tp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((group, Tp, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp, D), residual_dtype),
        interpret=interpret,
    )(x.astype(residual_dtype),
      lengths.astype(jnp.int32).reshape(Bp, 1), *folded)
    return y[:B, :T]


def fused_stack_apply(stacked_params, stacked_state, x, lengths, cfg, *,
                      collect_outputs: bool = False,
                      collect_every: int = 1,
                      interpret: bool | None = None):
    """Run a lax.scan-stacked Conformer stack through the fused kernel.

    Mirrors conformer.stack_apply(train=False): returns
    (y, state[, per_layer_outputs]).

    collect_every=k (with collect_outputs) stacks only every k-th
    layer's output — the early-exit trunk needs just the E exit-layer
    hiddens, and stacking all L then `take`-ing E back out costs an
    extra (L, B, T, D) write plus a (L+E, B, T, D) read/write of HBM
    traffic. Requires L % k == 0; the scan steps over L/k groups of k
    fused blocks and emits one output per group."""
    if interpret is None:   # Mosaic needs real TPU; interpret elsewhere
        interpret = jax.default_backend() != "tpu"
    qz = cfg.quantize if cfg.quantize != "none" else None
    folded = fold_block_params(stacked_params, stacked_state,
                               compute_dtype=cfg.dtype, quantize=qz)

    def one_block(h, layer):
        h = fused_block_apply(
            layer, h, lengths, n_heads=cfg.n_heads,
            kernel_size=cfg.kernel_size, compute_dtype=cfg.dtype,
            residual_dtype=cfg.rdtype, attn_softmax_dtype=cfg.sm_dtype,
            interpret=interpret, quantize=qz)
        return h, None

    k = collect_every if collect_outputs else 1
    if k == 1:
        def body(h, layer):
            h, _ = one_block(h, layer)
            return h, (h if collect_outputs else None)
        y, outs = jax.lax.scan(body, x, folded)
    else:
        L = jax.tree_util.tree_leaves(folded)[0].shape[0]
        assert L % k == 0, (L, k)
        grouped = jax.tree_util.tree_map(
            lambda p: p.reshape((L // k, k) + p.shape[1:]), folded)

        def body(h, group):
            h, _ = jax.lax.scan(one_block, h, group)
            return h, h
        y, outs = jax.lax.scan(body, x, grouped)
    if collect_outputs:
        return y, stacked_state, outs
    return y, stacked_state

"""Ablation profile of the fused Conformer-block kernel on real TPU.

Times `fused_block_apply` at the bench geometry (B=128, 10 s utts →
Tp=256, d=256, h=8, k=31, bf16 profile) with individual components
compiled out (the kernel's profiling-only `ablate` hook), attributing
hardware time by differencing against the full kernel. This is how the
round-3 dense optimization targets were chosen — see BENCH_NOTES.md.

Run: EET_* unset (real TPU), `python tools/ablate_fused_block.py`.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from early_exit_tpu.runtime import enable_compilation_cache
from early_exit_tpu.ops.pallas.conformer_block import (
    PARAM_ORDER, fused_block_apply)

B, T, D, H, DFF, K = 128, 249, 256, 8, 2048, 31
N_LAYERS = 12
ITERS = 30

ABLATIONS = [
    (),                       # full kernel (baseline)
    ("ln",),                  # LayerNorm mean/var/rsqrt -> scale/shift
    ("ln2p",),                # LayerNorm centered two-pass stats
    ("softmax",),             # softmax -> identity (dots remain)
    ("silu",),                # FFN + conv SiLU -> identity
    ("glu",),                 # GLU sigmoid gate -> passthrough
    ("dwconv",),              # 31-tap depthwise conv -> identity
    ("attn",),                # whole MHSA module (incl. q/k/v/o matmuls)
    ("conv",),                # whole conv module (incl. pw matmuls)
    ("ffn",),                 # both macaron FFN halves
    ("ln", "softmax", "silu", "glu", "dwconv"),   # all-VPU-lite
]


def make_folded(rng):
    """Random params in the kernel's folded layout (shapes only matter)."""
    shapes = {
        "ffn1_w1": (D, DFF), "ffn1_b1": (1, DFF),
        "ffn1_w2": (DFF, D), "ffn1_b2": (1, D),
        "wq": (D, D), "bq": (1, D), "wk": (D, D), "bk": (1, D),
        "wv": (D, D), "bv": (1, D), "wo": (D, D), "bo": (1, D),
        "pw1_w": (D, 2 * D), "pw1_b": (1, 2 * D),
        "dw_w": (K, D), "dw_b": (1, D),
        "bn_scale": (1, D), "bn_shift": (1, D),
        "pw2_w": (D, D), "pw2_b": (1, D),
        "ffn2_w1": (D, DFF), "ffn2_b1": (1, DFF),
        "ffn2_w2": (DFF, D), "ffn2_b2": (1, D),
    }
    out = []
    for name in PARAM_ORDER:
        if name.endswith(("_ln_g", "_ln_b")) or name in (
                "bn_scale", "bn_shift", "dw_b"):
            a = jnp.asarray(rng.normal(0, 0.02, (1, D)), jnp.float32)
        elif name in shapes:
            a = jnp.asarray(rng.normal(0, 0.02, shapes[name]),
                            jnp.bfloat16)
        else:
            raise KeyError(name)
        out.append(a)
    return tuple(out)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    folded = make_folded(rng)
    x = jnp.asarray(rng.normal(0, 1, (B, T, D)), jnp.bfloat16)
    lengths = jnp.full((B,), T, jnp.int32)

    def run(ablate):
        def stack(x):
            for _ in range(N_LAYERS):
                x = fused_block_apply(
                    folded, x, lengths, n_heads=H, kernel_size=K,
                    compute_dtype=jnp.bfloat16,
                    residual_dtype=jnp.bfloat16,
                    attn_softmax_dtype=jnp.bfloat16,
                    ablate=frozenset(ablate))
            return x
        f = jax.jit(stack)
        y = f(x); y.block_until_ready()           # compile
        # relay RTT amortisation: one device sync over ITERS dispatches
        t0 = time.perf_counter()
        for _ in range(ITERS):
            y = f(x)
        y.block_until_ready()
        return (time.perf_counter() - t0) / ITERS * 1e3

    base = None
    for ab in ABLATIONS:
        ms = run(ab)
        if base is None:
            base = ms
            print(f"{'FULL':38s} {ms:7.2f} ms")
        else:
            print(f"-{','.join(ab):37s} {ms:7.2f} ms  (saves {base-ms:5.2f})")


if __name__ == "__main__":
    main()

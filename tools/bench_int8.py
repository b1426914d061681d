"""Measure the W8A8 int8 inference path on the real TPU.

Three legs, amortised-dispatch timing (BENCH_NOTES.md methodology:
enqueue N programs, one sync, subtract the measured relay RTT):

1. raw matmul rate: bf16 vs int8 at the FFN shape (sanity: the v5e MXU
   doubles its MAC rate at int8 — 394 vs 197 TOPS peak);
2. end-to-end dense inference (mel -> 12 blocks -> heads -> greedy) at
   B=128/10 s: bf16 XLA vs bf16 fused-Pallas vs int8 XLA;
3. the same at B=64 (the gated micro-batch geometry).

Usage: python tools/bench_int8.py   (occupies the TPU chip; minutes)
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from early_exit_tpu.runtime import enable_compilation_cache

enable_compilation_cache()


def relay_rtt():
    tiny = jax.jit(lambda x: jnp.sum(x))
    x = jnp.zeros((8,), jnp.int32)
    float(tiny(x))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(tiny(x))
        best = min(best, time.perf_counter() - t0)
    return best


def amortised(fn, *args, iters=50, rt=0.0):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return max(time.perf_counter() - t0 - rt, 1e-9) / iters


def leg_matmul(rt):
    M, K, N = 32768, 256, 2048
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), jnp.bfloat16)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32)), -127, 127).astype(jnp.int8)

    bf = jax.jit(lambda a, b: jnp.sum(jnp.dot(a, b).astype(jnp.float32)))
    i8 = jax.jit(lambda a, b: jnp.sum(jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)))
    t_bf = amortised(bf, x, w, rt=rt)
    t_i8 = amortised(i8, xq, wq, rt=rt)
    flops = 2 * M * K * N
    print(f"matmul {M}x{K}x{N}: bf16 {t_bf*1e3:.3f} ms "
          f"({flops/t_bf/1e12:.0f} TFLOPS) | int8 {t_i8*1e3:.3f} ms "
          f"({flops/t_i8/1e12:.0f} TOPS) | ratio {t_bf/t_i8:.2f}x")


def leg_model(B, rt):
    from early_exit_tpu.configs import AudioConfig, ModelConfig
    from early_exit_tpu.models import early_conformer
    from early_exit_tpu.ops import ctc, frontend

    acfg = AudioConfig()
    SECONDS = 10.0
    N = int(SECONDS * acfg.sample_rate)
    rng = np.random.RandomState(0)
    wav = jnp.asarray((0.1 * rng.randn(B, N)).astype(np.float32))
    counts = jnp.asarray([N] * B)

    def make(cfg):
        params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)

        @jax.jit
        def infer(wav, counts):
            feats = frontend.mel_spectrogram(wav, acfg, method="dft")
            lengths = frontend.mel_lengths(counts, acfg.hop_length)
            logits, sub_len, _ = early_conformer.apply(
                params, state, feats, lengths, cfg, train=False,
                log_probs=False)
            toks, ntoks = ctc.greedy_decode(logits[-1], sub_len)
            return jnp.sum(ntoks) + jnp.sum(toks) + jnp.sum(
                logits[:, :, 0, 0])

        return infer

    base = ModelConfig(attn_softmax_dtype="bfloat16")
    legs = {
        "bf16 xla": base,
        "bf16 fused": dataclasses.replace(base, fused_block=True),
        "int8 xla": dataclasses.replace(base, quantize="int8"),
        "int8 fused": dataclasses.replace(base, fused_block=True,
                                          quantize="int8"),
    }
    audio_s = B * SECONDS
    for name, cfg in legs.items():
        dt = amortised(make(cfg), wav, counts, rt=rt)
        print(f"B={B} {name:11s}: {dt*1e3:6.2f} ms  "
              f"RTF {audio_s/dt:9.0f}x  vs_baseline "
              f"{audio_s/dt/75000:.3f}")


def main():
    batches = [int(a) for a in sys.argv[1:]] or [128]
    print("devices:", jax.devices())
    rt = relay_rtt()
    print(f"relay rtt: {rt*1e3:.1f} ms")
    leg_matmul(rt)
    for b in batches:
        leg_model(b, rt)


if __name__ == "__main__":
    main()

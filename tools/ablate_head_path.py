#!/usr/bin/env python
"""Attribute the dense-bench ms between trunk, head paths, and decode.

Variants (bench geometry, fused trunk, trained-shape random weights):
  trunk        — apply_hidden only (12 fused blocks + 12-stack + take)
  old_last     — round-3 headline: apply(log_probs=False) + argmax/decode
                 of the LAST exit only + all-exit fingerprint
  kernel_all   — apply_hidden + head_argmax kernel + all-exit decode
  xla_all      — apply_hidden + XLA heads + argmax + all-exit decode
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from early_exit_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

from early_exit_tpu.configs import AudioConfig, ModelConfig  # noqa: E402
from early_exit_tpu.models import early_conformer  # noqa: E402
from early_exit_tpu.ops import ctc, frontend  # noqa: E402
from early_exit_tpu.ops.pallas import head_argmax as ha  # noqa: E402


def main():
    import os as _os
    acfg = AudioConfig()
    cfg = ModelConfig(attn_softmax_dtype="bfloat16", fused_block=True)
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    B, SECONDS = int(_os.environ.get("AB_B", "128")), 10.0
    N = int(SECONDS * acfg.sample_rate)
    rng = np.random.RandomState(0)
    wav = jnp.asarray((0.1 * rng.randn(B, N)).astype(np.float32))
    counts = jnp.asarray([N] * B)

    def front(wav, counts):
        feats = frontend.mel_spectrogram(wav, acfg, method="dft")
        lengths = frontend.mel_lengths(counts, acfg.hop_length)
        return feats, lengths

    @jax.jit
    def trunk(params, state, wav, counts):
        feats, lengths = front(wav, counts)
        hidden, sub_len = early_conformer.apply_hidden(
            params, state, feats, lengths, cfg)
        return jnp.sum(hidden[:, :, 0, 0].astype(jnp.float32))

    @jax.jit
    def old_last(params, state, wav, counts):
        feats, lengths = front(wav, counts)
        log_probs, sub_len, _ = early_conformer.apply(
            params, state, feats, lengths, cfg, train=False,
            log_probs=False)
        tokens, n_tokens = ctc.greedy_decode(log_probs[-1], sub_len)
        return (jnp.sum(n_tokens) + jnp.sum(tokens)
                + jnp.sum(log_probs[:, :, 0, 0]))

    @jax.jit
    def kernel_all(params, state, wav, counts):
        feats, lengths = front(wav, counts)
        hidden, sub_len = early_conformer.apply_hidden(
            params, state, feats, lengths, cfg)
        ids = ha.head_argmax(hidden, params["heads"]["w"],
                             params["heads"]["b"])
        tokens, n_tokens = jax.vmap(
            lambda b: ctc.greedy_decode_ids(b, sub_len))(ids)
        return jnp.sum(n_tokens) + jnp.sum(tokens)

    @jax.jit
    def xla_all(params, state, wav, counts):
        feats, lengths = front(wav, counts)
        hidden, sub_len = early_conformer.apply_hidden(
            params, state, feats, lengths, cfg)
        logits = early_conformer.apply_heads(params["heads"], hidden, cfg,
                                             log_probs=False)
        ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tokens, n_tokens = jax.vmap(
            lambda b: ctc.greedy_decode_ids(b, sub_len))(ids)
        return jnp.sum(n_tokens) + jnp.sum(tokens)

    for name, fn in [("trunk", trunk), ("old_last", old_last),
                     ("kernel_all", kernel_all), ("xla_all", xla_all)]:
        float(fn(params, state, wav, counts))     # compile+warm
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params, state, wav, counts)
        float(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:12s} {dt:7.3f} ms   rtf={B * SECONDS / (dt / 1e3):,.0f}x")


if __name__ == "__main__":
    main()

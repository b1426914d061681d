#!/usr/bin/env python
"""Micro-bench greedy-collapse variants at the bench geometry.

The all-exits greedy decode (reference inference.py:66-72 semantics)
runs the CTC collapse on (E=6, B=128, T'=249) argmax ids; the current
one-hot-matmul compaction materializes a (B, T, T) fp32 one-hot per
exit (~570 MB of HBM traffic total). Candidates:
  onehot_f32  — current ctc.greedy_decode_ids
  onehot_bf16 — same, bf16 one-hot + bf16 vals (ids < 256 exact)
  sort        — lax.sort_key_val by scatter position (O(T log^2 T))
  scatter     — .at[].set(mode=drop) (notes say pathological; re-check)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from early_exit_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

E, B, T, V = 6, 128, 249, 256
BLANK = 0


def _mk_keep_vals(best, lengths):
    Bb, Tt = best.shape
    t_idx = jnp.arange(Tt)[None, :]
    valid = t_idx < lengths[:, None]
    prev = jnp.concatenate(
        [jnp.full((Bb, 1), -1, best.dtype), best[:, :-1]], axis=1)
    keep = (best != BLANK) & (best != prev) & valid
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    n = jnp.sum(keep, axis=1)
    scatter_pos = jnp.where(keep, pos, Tt)
    return keep, scatter_pos, n


def collapse_onehot(best, lengths, dtype):
    keep, scatter_pos, n = _mk_keep_vals(best, lengths)
    Bb, Tt = best.shape
    onehot = (scatter_pos[:, :, None] == jnp.arange(Tt)[None, None, :])
    vals = jnp.where(keep, best, 0).astype(dtype)
    out = jnp.einsum("bt,btp->bp", vals, onehot.astype(dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(best.dtype), n


def collapse_sort(best, lengths):
    keep, scatter_pos, n = _mk_keep_vals(best, lengths)
    vals = jnp.where(keep, best, 0)
    _, out = jax.lax.sort_key_val(scatter_pos, vals, dimension=1)
    return out, n


def collapse_scatter(best, lengths):
    keep, scatter_pos, n = _mk_keep_vals(best, lengths)
    Bb, Tt = best.shape
    vals = jnp.where(keep, best, 0)
    out = jnp.zeros((Bb, Tt), best.dtype).at[
        jnp.arange(Bb)[:, None], scatter_pos].set(vals, mode="drop")
    return out, n


def main():
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, V, size=(E, B, T)).astype(np.int32))
    lengths = jnp.asarray(rng.randint(T // 2, T, size=(B,)).astype(np.int32))

    variants = {
        "onehot_f32": jax.jit(jax.vmap(
            lambda b: collapse_onehot(b, lengths, jnp.float32))),
        "onehot_bf16": jax.jit(jax.vmap(
            lambda b: collapse_onehot(b, lengths, jnp.bfloat16))),
        "sort": jax.jit(jax.vmap(lambda b: collapse_sort(b, lengths))),
        "scatter": jax.jit(jax.vmap(lambda b: collapse_scatter(b, lengths))),
    }

    ref = None
    for name, fn in variants.items():
        out, n = fn(ids)
        out = np.asarray(out)
        n = np.asarray(n)
        if ref is None:
            ref = (out, n)
        else:
            assert np.array_equal(n, ref[1]), name
            # compare only filled slots (sort/scatter leave junk past n)
            for e in range(E):
                for b in range(B):
                    k = int(n[e, b])
                    assert np.array_equal(out[e, b, :k], ref[0][e, b, :k]), \
                        (name, e, b)
        # timing: queue many, sync once
        fn(ids)[1].block_until_ready()
        iters = 100
        t0 = time.perf_counter()
        for _ in range(iters):
            o, nn = fn(ids)
        nn.block_until_ready()
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:12s} {dt:7.3f} ms")


if __name__ == "__main__":
    main()

import math

import jax.numpy as jnp
import numpy as np

from early_exit_tpu.decoding import prefix_beam
from early_exit_tpu.ops import ctc


def _ref_prefix_beam(lp, beam_size, blank=0, blank_skip=0.95):
    """Clean-room dict-based CTC prefix beam search (standard algorithm)
    as a test oracle; no top-N token pruning."""
    T, V = lp.shape
    NEG = -1e30

    def lse(a, b):
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    beams = {(): (0.0, NEG)}   # prefix -> (p_b, p_nb)
    for t in range(T):
        if lp[t, blank] > math.log(blank_skip):
            beams = {p: (lse(pb, pnb) + lp[t, blank], NEG)
                     for p, (pb, pnb) in beams.items()}
            continue
        new = {}

        def add(prefix, pb, pnb):
            opb, opnb = new.get(prefix, (NEG, NEG))
            new[prefix] = (lse(opb, pb), lse(opnb, pnb))

        for prefix, (pb, pnb) in beams.items():
            # blank
            add(prefix, lse(pb, pnb) + lp[t, blank], NEG)
            # repeat last (same prefix)
            if prefix:
                add(prefix, NEG, pnb + lp[t, prefix[-1]])
            for c in range(V):
                if c == blank:
                    continue
                base = pb if (prefix and c == prefix[-1]) else lse(pb, pnb)
                add(prefix + (c,), NEG, base + lp[t, c])
        beams = dict(sorted(new.items(),
                            key=lambda kv: -lse(*kv[1]))[:beam_size])
    best = max(beams.items(), key=lambda kv: lse(*kv[1]))
    return list(best[0]), lse(*best[1])


def _rand_lp(T, V, seed, peaky=False):
    rng = np.random.RandomState(seed)
    logits = rng.randn(T, V).astype(np.float32)
    if peaky:
        logits = logits * 20.0
    x = logits - logits.max(-1, keepdims=True)
    p = np.exp(x)
    p /= p.sum(-1, keepdims=True)
    return np.log(p).astype(np.float32)


def test_matches_reference_implementation():
    for seed in range(5):
        T, V, K = 12, 5, 4
        lp = _rand_lp(T, V, seed)
        toks, n, score = prefix_beam.prefix_beam_search(
            jnp.asarray(lp[None]), jnp.asarray([T]), beam_size=K,
            topn=V - 1)
        ref_toks, ref_score = _ref_prefix_beam(lp, K)
        got = [int(t) for t in np.asarray(toks[0])[:int(n[0])]]
        assert got == ref_toks, (seed, got, ref_toks)
        np.testing.assert_allclose(float(score[0]), ref_score, rtol=1e-4)


def test_peaky_matches_greedy():
    """With near-one-hot emissions the best prefix equals greedy."""
    T, V, K = 20, 8, 6
    lp = _rand_lp(T, V, seed=9, peaky=True)
    toks, n, _ = prefix_beam.prefix_beam_search(
        jnp.asarray(lp[None]), jnp.asarray([T]), beam_size=K, topn=V - 1)
    g_toks, g_n = ctc.greedy_decode(jnp.asarray(lp[None]),
                                    jnp.asarray([T]))
    got = [int(t) for t in np.asarray(toks[0])[:int(n[0])]]
    ref = [int(t) for t in np.asarray(g_toks[0])[:int(g_n[0])]]
    assert got == ref


def test_blank_skip_frames():
    """Frames dominated by blank must not extend prefixes."""
    V = 5
    lp = np.full((6, V), -12.0, np.float32)
    lp[:, 0] = -1e-6            # all frames ~pure blank
    lp[2] = np.log(np.asarray([0.05, 0.9, 0.02, 0.02, 0.01]))
    toks, n, score = prefix_beam.prefix_beam_search(
        jnp.asarray(lp[None]), jnp.asarray([6]), beam_size=4, topn=4)
    got = [int(t) for t in np.asarray(toks[0])[:int(n[0])]]
    assert got == [1]


def test_length_masking():
    T, V = 16, 5
    lp = _rand_lp(T, V, seed=3)
    # truncating via lengths must equal decoding the truncated array
    toks_a, n_a, s_a = prefix_beam.prefix_beam_search(
        jnp.asarray(lp[None]), jnp.asarray([9]), beam_size=4, topn=V - 1)
    toks_b, n_b, s_b = prefix_beam.prefix_beam_search(
        jnp.asarray(lp[None, :9]), jnp.asarray([9]), beam_size=4,
        topn=V - 1)
    a = [int(t) for t in np.asarray(toks_a[0])[:int(n_a[0])]]
    b = [int(t) for t in np.asarray(toks_b[0])[:int(n_b[0])]]
    assert a == b
    np.testing.assert_allclose(float(s_a[0]), float(s_b[0]), rtol=1e-5)


def test_batch_vectorised():
    V = 6
    lps = np.stack([_rand_lp(10, V, s) for s in range(3)])
    toks, n, scores = prefix_beam.prefix_beam_search(
        jnp.asarray(lps), jnp.asarray([10, 10, 7]), beam_size=4,
        topn=V - 1)
    assert toks.shape == (3, 10)
    for b in range(3):
        ref_toks, _ = _ref_prefix_beam(lps[b][:int([10, 10, 7][b])], 4)
        got = [int(t) for t in np.asarray(toks[b])[:int(n[b])]]
        assert got == ref_toks

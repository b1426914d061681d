import jax.numpy as jnp
import numpy as np

from early_exit_tpu.decoding import forced_align as fa


def _trellis_numpy(em, tokens, blank=0):
    T, V = em.shape
    L = len(tokens)
    NEG = -1e30
    tr = np.full((T + 1, L + 1), NEG)
    tr[0, 0] = 0.0
    for t in range(T):
        for j in range(L + 1):
            stay = tr[t, j] + em[t, blank]
            change = tr[t, j - 1] + em[t, tokens[j - 1]] if j > 0 else NEG
            tr[t + 1, j] = max(stay, change)
    return tr


def test_trellis_matches_numpy_dp():
    rng = np.random.RandomState(0)
    em = np.log(rng.dirichlet(np.ones(6), size=15)).astype(np.float32)
    tokens = np.asarray([2, 3, 2, 5])
    ours = np.asarray(fa.get_trellis(jnp.asarray(em), jnp.asarray(tokens)))
    ref = _trellis_numpy(em, tokens)
    valid = ref > -1e29
    np.testing.assert_allclose(ours[valid], ref[valid], rtol=1e-5)


def test_alignment_on_synthetic_emissions():
    """Tokens planted at known frames must align there."""
    V, T = 6, 12
    em = np.full((T, V), -10.0, np.float32)
    em[:, 0] = -0.01                       # blank elsewhere
    plan = {2: 3, 6: 4, 9: 1}              # frame -> token
    for f, tok in plan.items():
        em[f] = -10.0
        em[f, tok] = -0.01
    tokens = jnp.asarray([3, 4, 1])
    starts, ends, score = fa.forced_align(jnp.asarray(em), tokens)
    np.testing.assert_array_equal(starts, [2, 6, 9])
    # a token's span runs until the next token advances; the last token
    # absorbs the trailing blank frames (torchaudio merge_repeats)
    np.testing.assert_array_equal(ends, [5, 8, 11])
    assert score > -2.0                    # near-certain path


def test_backtrack_path_is_monotonic():
    rng = np.random.RandomState(1)
    em = np.log(rng.dirichlet(np.ones(5), size=20)).astype(np.float32)
    tokens = jnp.asarray([1, 2, 3])
    tr = fa.get_trellis(jnp.asarray(em), tokens)
    pts = fa.backtrack(tr, jnp.asarray(em), tokens)
    times = [p.time_index for p in pts]
    toks = [p.token_index for p in pts]
    assert times == sorted(times)
    assert toks == sorted(toks)
    assert toks[0] == 0 and toks[-1] == 2

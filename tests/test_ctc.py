import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.ops import ctc

torch = pytest.importorskip("torch")


def _random_case(B=4, T=50, V=20, L=12, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, T, V).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_lengths = np.asarray([T, T - 7, T - 15, 20])
    labels = rng.randint(1, V, size=(B, L)).astype(np.int64)
    label_lengths = np.asarray([L, L - 3, 5, 8])
    return np.asarray(log_probs), input_lengths, labels, label_lengths


def _torch_ctc(log_probs, input_lengths, labels, label_lengths,
               reduction="mean"):
    lp = torch.tensor(log_probs).permute(1, 0, 2)  # (T, B, V)
    fn = torch.nn.CTCLoss(blank=0, zero_infinity=True, reduction=reduction)
    return fn(lp, torch.tensor(labels), torch.tensor(input_lengths),
              torch.tensor(label_lengths))


def test_ctc_matches_torch_mean():
    lp, il, lb, ll = _random_case()
    ours = ctc.ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(lb),
                        jnp.asarray(ll))
    ref = _torch_ctc(lp, il, lb, ll).item()
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_ctc_matches_torch_none():
    lp, il, lb, ll = _random_case(seed=3)
    ours = ctc.ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(lb),
                        jnp.asarray(ll), reduction="none")
    ref = _torch_ctc(lp, il, lb, ll, reduction="none").numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5)


def test_ctc_infeasible_zeroed():
    # label longer than input allows -> zero_infinity clamps to 0
    lp, il, lb, ll = _random_case()
    il = np.asarray([3, 3, 3, 3])   # way too short for L=12 labels
    ours = ctc.ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(lb),
                        jnp.asarray(ll), reduction="none")
    ref = _torch_ctc(lp, il, lb, ll, reduction="none").numpy()
    np.testing.assert_allclose(np.asarray(ours)[:2], ref[:2], atol=1e-4)
    assert float(ours[0]) == 0.0


def test_ctc_gradient_matches_torch():
    lp, il, lb, ll = _random_case(B=2, T=20, V=8, L=5, seed=1)
    il = il[:2].copy(); lb = lb[:2]; ll = np.asarray([5, 3])

    def loss_fn(x):
        return ctc.ctc_loss(jax.nn.log_softmax(x, axis=-1),
                            jnp.asarray(il), jnp.asarray(lb), jnp.asarray(ll))

    raw = np.random.RandomState(7).randn(2, 20, 8).astype(np.float32)
    g_ours = jax.grad(loss_fn)(jnp.asarray(raw))

    xt = torch.tensor(raw, requires_grad=True)
    lpt = torch.log_softmax(xt, dim=-1).permute(1, 0, 2)
    fn = torch.nn.CTCLoss(blank=0, zero_infinity=True)
    loss = fn(lpt, torch.tensor(lb), torch.tensor(il), torch.tensor(ll))
    loss.backward()
    np.testing.assert_allclose(np.asarray(g_ours), xt.grad.numpy(),
                               atol=1e-5)


def test_ctc_repeated_labels():
    """Repeats force the no-skip path; check vs torch."""
    rng = np.random.RandomState(5)
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.randn(1, 30, 6).astype(np.float32)), axis=-1))
    lb = np.asarray([[2, 2, 3, 3, 2]], dtype=np.int64)
    il, ll = np.asarray([30]), np.asarray([5])
    ours = ctc.ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(lb),
                        jnp.asarray(ll))
    ref = _torch_ctc(lp, il, lb, ll).item()
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_greedy_decode():
    # construct emissions with a known best path
    V, blank = 5, 0
    path = [0, 2, 2, 0, 3, 3, 3, 0, 2, 1]     # -> [2, 3, 2, 1]
    T = len(path)
    lp = np.full((1, T, V), -10.0, np.float32)
    for t, s in enumerate(path):
        lp[0, t, s] = 0.0
    toks, n = ctc.greedy_decode(jnp.asarray(lp), jnp.asarray([T]))
    assert int(n[0]) == 4
    np.testing.assert_array_equal(np.asarray(toks[0, :4]), [2, 3, 2, 1])

    # length masking: only first 4 frames -> [2]
    toks, n = ctc.greedy_decode(jnp.asarray(lp), jnp.asarray([4]))
    assert int(n[0]) == 1 and int(toks[0, 0]) == 2


def test_greedy_decode_long_t_scatter_path():
    """T > 1024 takes the O(B*T) scatter fallback (ADVICE r2: the one-hot
    compaction matmul is quadratic in T); must match the matmul path."""
    rng = np.random.RandomState(7)
    B, T, V, blank = 3, 1500, 8, 0
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.randn(B, T, V).astype(np.float32)), axis=-1))
    lengths = np.asarray([T, 700, 1201])
    toks, n = ctc.greedy_decode(jnp.asarray(lp), jnp.asarray(lengths))
    # host oracle
    for b in range(B):
        ids = lp[b, :lengths[b]].argmax(-1)
        ref, prev = [], -1
        for i in ids:
            if i != blank and i != prev:
                ref.append(int(i))
            prev = int(i)
        assert int(n[b]) == len(ref)
        np.testing.assert_array_equal(np.asarray(toks[b, :len(ref)]), ref)
        # padding reads as blank
        assert np.all(np.asarray(toks[b, len(ref):]) == blank)

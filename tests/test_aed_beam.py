import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.decoding import aed_beam
from early_exit_tpu.models import full_conformer

TINY = ModelConfig(model_type="full_conformer", d_model=32, n_heads=4,
                   d_feed_forward=64, n_enc_exits=2,
                   n_enc_layers_per_exit=1, n_dec_layers=2,
                   depthwise_kernel_size=7, vocab_size=24, n_mels=8,
                   compute_dtype="float32", drop_prob=0.0,
                   pad_id=20, bos_id=1, eos_id=2)


def test_length_penalty_formula():
    np.testing.assert_allclose(aed_beam.length_penalty(1, 1.0), 1.0)
    np.testing.assert_allclose(aed_beam.length_penalty(7, 1.0), 2.0)
    np.testing.assert_allclose(aed_beam.length_penalty(7, 0.5), 2.0 ** 0.5)


def _memory(cfg, T=11, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(1, T, cfg.d_model).astype(np.float32))


def test_beam_search_runs_and_is_deterministic():
    cfg = TINY
    params, state = full_conformer.init(jax.random.PRNGKey(0), cfg)
    mem = _memory(cfg)
    toks, lens, scores, best = aed_beam.beam_search_exit(
        params, mem, cfg, n_exit=1, beam_size=4, max_length=12,
        min_length=2)
    toks2, lens2, scores2, best2 = aed_beam.beam_search_exit(
        params, mem, cfg, n_exit=1, beam_size=4, max_length=12,
        min_length=2)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
    assert int(best) == int(best2)
    assert toks.shape == (4, 13)
    assert np.asarray(toks)[:, 0].tolist() == [cfg.bos_id] * 4
    assert np.isfinite(float(scores[best]))


@pytest.mark.slow
def test_beam1_matches_greedy_rollout():
    """With beam_size=1 and alpha=0 the beam search must equal a greedy
    autoregressive rollout through decode_exit."""
    cfg = TINY
    params, state = full_conformer.init(jax.random.PRNGKey(1), cfg)
    mem = _memory(cfg, seed=2)
    L = 8
    toks, lens, scores, best = aed_beam.beam_search_exit(
        params, mem, cfg, n_exit=2, beam_size=1, max_length=L,
        min_length=L + 1,    # never retire: pure greedy continuation
        pen_alpha=0.0)

    ref = [cfg.bos_id]
    for _ in range(L):
        trg = jnp.asarray([ref])
        lp = full_conformer.decode_exit(params, trg, mem, cfg, 2)
        ref.append(int(jnp.argmax(lp[0, -1])))
    np.testing.assert_array_equal(np.asarray(toks[0]),
                                  np.asarray(ref, np.int32))


def test_eos_retires_beam():
    """Force EOS to dominate: all lanes should retire and keep length."""
    cfg = TINY
    params, state = full_conformer.init(jax.random.PRNGKey(0), cfg)
    # bias every decoder output toward EOS via the shared output linears
    import jax.tree_util as jtu
    p2 = jtu.tree_map(lambda x: x, params)
    b = np.zeros((cfg.n_enc_exits, cfg.vocab_size), np.float32)
    b[:, cfg.eos_id] = 50.0
    p2["out_linear"] = dict(p2["out_linear"])
    p2["out_linear"]["b"] = jnp.asarray(b)
    mem = _memory(cfg)
    toks, lens, scores, best = aed_beam.beam_search_exit(
        p2, mem, cfg, n_exit=1, beam_size=3, max_length=10, min_length=3)
    # EOS becomes selectable at i=4 (> min_length=3) -> length 1+4+1
    assert int(lens[best]) <= 7
    out = aed_beam.trim_hypothesis(np.asarray(toks[best]),
                                   int(lens[best]), eos_id=cfg.eos_id,
                                   bos_id=cfg.bos_id)
    assert out[-1] == cfg.eos_id


def test_batched_beam_matches_per_utterance():
    cfg = TINY
    params, state = full_conformer.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(7)
    mems = jnp.asarray(rng.randn(3, 11, cfg.d_model).astype(np.float32))
    min_lens = jnp.asarray([2, 3, 2])
    bt, bl, bs, bbest = aed_beam.beam_search_exit_batch(
        params, mems, min_lens, cfg, n_exit=1, beam_size=4, max_length=10)
    for b in range(3):
        t, l, s, best = aed_beam.beam_search_exit(
            params, mems[b:b + 1], cfg, n_exit=1, beam_size=4,
            max_length=10, min_length=int(min_lens[b]))
        np.testing.assert_array_equal(np.asarray(bt[b]), np.asarray(t))
        np.testing.assert_allclose(np.asarray(bs[b]), np.asarray(s),
                                   rtol=1e-4)
        assert int(bbest[b]) == int(best)

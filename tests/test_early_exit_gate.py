import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import early_conformer, early_exit_gate
from early_exit_tpu.models import splitformer

TINY = ModelConfig(d_model=32, n_heads=4, d_feed_forward=64,
                   n_enc_exits=3, n_enc_layers_per_exit=2,
                   depthwise_kernel_size=7, vocab_size=40, n_mels=16,
                   compute_dtype="float32")


def _batch(cfg, B=2, T=61, seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, T, cfg.n_mels).astype(np.float32))
    return feats, jnp.asarray([T, T - 20])


def test_threshold_zero_stops_at_first_exit():
    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    lp, chosen, sub_len, n_run = early_exit_gate.gated_apply(
        params, state, feats, lengths, cfg, threshold=0.0)
    assert int(n_run) == 1
    np.testing.assert_array_equal(np.asarray(chosen), [1, 1])
    full, _, _ = early_conformer.apply(params, state, feats, lengths, cfg)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(full[0]),
                               atol=1e-4)


def test_threshold_impossible_runs_all_exits():
    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    lp, chosen, sub_len, n_run = early_exit_gate.gated_apply(
        params, state, feats, lengths, cfg, threshold=1.01)
    assert int(n_run) == cfg.n_enc_exits
    np.testing.assert_array_equal(np.asarray(chosen), [3, 3])
    full, _, _ = early_conformer.apply(params, state, feats, lengths, cfg)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(full[-1]),
                               atol=1e-4)


def test_gate_is_jittable():
    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    fn = jax.jit(lambda p, s, f, l: early_exit_gate.gated_apply(
        p, s, f, l, cfg, threshold=0.5))
    lp, chosen, sub_len, n_run = fn(params, state, feats, lengths)
    assert np.isfinite(np.asarray(lp)).all()
    assert 1 <= int(n_run) <= cfg.n_enc_exits


def test_confidence_formula():
    lp = jnp.log(jnp.asarray([[[0.9, 0.1], [0.6, 0.4], [0.5, 0.5]]]))
    mask = jnp.asarray([[True, True, False]])
    conf = early_exit_gate.exit_confidence(lp, mask)
    np.testing.assert_allclose(float(conf[0]), (0.9 + 0.6) / 2, rtol=1e-5)


@pytest.mark.parametrize("threshold,exit_idx", [(0.0, 0), (1.01, -1)])
def test_splitformer_gate_matches_full_apply(threshold, exit_idx):
    """The gate must include splitformer's parallel branch at the first
    and last exits (regression: the early_conformer-only gate silently
    skipped it — 30% WER at exit 1 on a checkpoint whose plain exit-1
    greedy decode was 0%)."""
    cfg = ModelConfig(**{**TINY.__dict__, "model_type": "splitformer"})
    params, state = splitformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    lp, chosen, sub_len, n_run = early_exit_gate.gated_apply(
        params, state, feats, lengths, cfg, threshold=threshold)
    want_exit = cfg.n_enc_exits if exit_idx == -1 else exit_idx + 1
    assert int(n_run) == want_exit
    np.testing.assert_array_equal(np.asarray(chosen),
                                  [want_exit, want_exit])
    full, _, _ = splitformer.apply(params, state, feats, lengths, cfg)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(full[exit_idx]),
                               atol=1e-4)


def test_single_exit_models_are_rejected():
    cfg = ModelConfig(**{**TINY.__dict__, "model_type": "early_zipformer"})
    params, state = early_conformer.init(jax.random.PRNGKey(0), TINY)
    feats, lengths = _batch(TINY)
    with pytest.raises(ValueError, match="single output exit"):
        early_exit_gate.gated_apply(params, state, feats, lengths, cfg,
                                    threshold=0.5)


def test_item_mask_padding_rows_do_not_block_gate():
    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    # row 1 is a padding row with no valid frames
    lengths = jnp.asarray([61, 0])
    item_mask = jnp.asarray([1.0, 0.0])
    lp, chosen, sub_len, n_run = early_exit_gate.gated_apply(
        params, state, feats, lengths, cfg, threshold=0.0,
        item_mask=item_mask)
    assert int(n_run) == 1            # padding row doesn't force more exits
    assert int(chosen[0]) == 1

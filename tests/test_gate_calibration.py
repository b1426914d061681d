"""Gate calibration: score modes, temperature/threshold fitting, and the
calibrate_gate tool end to end on a tiny model."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import early_conformer, early_exit_gate
from early_exit_tpu.models import gate_calibration as gc

# vocab 32 = the char tokenizer's size, so the tool test below can load
# this checkpoint through the real CLI path with --bpe false
TINY = ModelConfig(d_model=32, n_heads=4, d_feed_forward=64,
                   n_enc_exits=3, n_enc_layers_per_exit=2,
                   depthwise_kernel_size=7, vocab_size=32, n_mels=16,
                   compute_dtype="float32")


def _batch(cfg, B=2, T=61, seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, T, cfg.n_mels).astype(np.float32))
    return feats, jnp.asarray([T, T - 20])


# ---------- confidence score modes ----------

def _lp(probs):
    return jnp.log(jnp.asarray(probs, jnp.float32))


def test_score_modes_rank_peaked_above_flat():
    peaked = _lp([[[0.97, 0.01, 0.01, 0.01]]])
    flat = _lp([[[0.25, 0.25, 0.25, 0.25]]])
    mask = jnp.asarray([[True]])
    for score in early_exit_gate.GATE_SCORES:
        hi = float(early_exit_gate.exit_confidence(peaked, mask, score)[0])
        lo = float(early_exit_gate.exit_confidence(flat, mask, score)[0])
        assert 0.0 <= lo < hi <= 1.0 + 1e-6, score


def test_margin_separates_two_way_splits_maxprob_conflates():
    # two-way split: top1 == 0.5 like a "half sure" frame, but margin
    # sees the runner-up
    split2 = _lp([[[0.5, 0.5, 0.0001, 0.0001]]])
    lean = _lp([[[0.5, 0.25, 0.125, 0.125]]])
    mask = jnp.asarray([[True]])
    mp_a = float(early_exit_gate.exit_confidence(split2, mask, "maxprob")[0])
    mp_b = float(early_exit_gate.exit_confidence(lean, mask, "maxprob")[0])
    np.testing.assert_allclose(mp_a, mp_b, atol=1e-5)   # conflated
    mg_a = float(early_exit_gate.exit_confidence(split2, mask, "margin")[0])
    mg_b = float(early_exit_gate.exit_confidence(lean, mask, "margin")[0])
    assert mg_a < mg_b                                   # separated


def test_negentropy_uniform_is_zero():
    V = 8
    lp = _lp([[[1.0 / V] * V]])
    mask = jnp.asarray([[True]])
    c = float(early_exit_gate.exit_confidence(lp, mask, "negentropy")[0])
    assert abs(c) < 1e-5


def test_unknown_score_rejected():
    with pytest.raises(ValueError, match="score"):
        early_exit_gate.exit_confidence(
            _lp([[[0.5, 0.5]]]), jnp.asarray([[True]]), "nope")


# ---------- per-exit thresholds + temperatures in gated_apply ----------

def test_per_exit_threshold_vector():
    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    # exit 1 unreachable, exit 2 free -> every row stops at exit 2
    lp, chosen, sub_len, n_run = early_exit_gate.gated_apply(
        params, state, feats, lengths, cfg, threshold=[2.0, 0.0, 2.0])
    assert int(n_run) == 2
    np.testing.assert_array_equal(np.asarray(chosen), [2, 2])
    full, _, _ = early_conformer.apply(params, state, feats, lengths, cfg)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(full[1]),
                               atol=1e-4)


def test_scalar_threshold_equals_broadcast_vector():
    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    a = early_exit_gate.gated_apply(params, state, feats, lengths, cfg,
                                    threshold=0.5)
    b = early_exit_gate.gated_apply(params, state, feats, lengths, cfg,
                                    threshold=[0.5] * cfg.n_enc_exits)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))


def test_temperature_one_is_identity():
    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    a = early_exit_gate.gated_apply(params, state, feats, lengths, cfg,
                                    threshold=0.5)
    b = early_exit_gate.gated_apply(params, state, feats, lengths, cfg,
                                    threshold=0.5,
                                    temperatures=[1.0] * cfg.n_enc_exits)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               atol=1e-6)


def test_high_temperature_forces_escalation():
    """Hot softmax flattens the confidence below any mid threshold, so
    the gate must run every exit; decode output stays the deep exit's
    UNSCALED log-probs."""
    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    # pick a threshold the raw confidence clears at some early exit
    lp0, chosen0, _, n0 = early_exit_gate.gated_apply(
        params, state, feats, lengths, cfg, threshold=0.0)
    assert int(n0) == 1
    lp, chosen, sub_len, n_run = early_exit_gate.gated_apply(
        params, state, feats, lengths, cfg, threshold=0.2,
        temperatures=[1000.0] * cfg.n_enc_exits)
    assert int(n_run) == cfg.n_enc_exits
    full, _, _ = early_conformer.apply(params, state, feats, lengths, cfg)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(full[-1]),
                               atol=1e-4)


def test_scaled_confidence_matches_direct_softmax():
    rng = np.random.RandomState(0)
    logits = rng.randn(1, 4, 6).astype(np.float32) * 3
    mask = jnp.asarray([[True, True, True, False]])
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    for t in (0.5, 2.0):
        want = early_exit_gate.exit_confidence(
            jax.nn.log_softmax(jnp.asarray(logits) / t, axis=-1), mask)
        got = gc.scaled_confidence(lp, mask, "maxprob", t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


# ---------- calibration math ----------

def test_ece_perfect_and_overconfident():
    rng = np.random.RandomState(0)
    conf = rng.uniform(0.05, 0.95, 4000)
    correct = (rng.uniform(size=4000) < conf).astype(float)
    assert gc.ece(conf, correct) < 0.03            # calibrated
    assert gc.ece(np.full(100, 0.99), np.zeros(100)) > 0.9


def test_fit_temperature_picks_calibrated_grid_point():
    temps = [0.5, 1.0, 2.0]
    rng = np.random.RandomState(1)
    true_p = rng.uniform(0.2, 0.9, 3000)
    correct = (rng.uniform(size=3000) < true_p).astype(float)
    conf_by_temp = np.stack([
        np.clip(true_p + 0.3, 0, 0.999),           # overconfident
        true_p,                                    # calibrated
        np.clip(true_p - 0.3, 0.001, 1),           # underconfident
    ])
    assert gc.fit_temperature(conf_by_temp, temps, correct) == 1


def test_pick_threshold_basic():
    conf = np.asarray([0.9, 0.8, 0.7, 0.6])
    errors = np.asarray([0.0, 0.0, 5.0, 0.0])
    words = np.asarray([10.0, 10.0, 10.0, 10.0])
    thr, rate, wer = gc.pick_threshold(conf, errors, words, 0.0)
    assert thr == 0.8 and rate == 0.5 and wer == 0.0
    # looser target admits the error row and everything after it
    thr, rate, wer = gc.pick_threshold(conf, errors, words, 0.2)
    assert thr == 0.6 and rate == 1.0


def test_pick_threshold_impossible_target():
    thr, rate, wer = gc.pick_threshold(
        np.asarray([0.9, 0.5]), np.asarray([3.0, 3.0]),
        np.asarray([10.0, 10.0]), 0.0)
    assert thr == 2.0 and rate == 0.0


def test_pick_threshold_does_not_split_ties():
    conf = np.asarray([0.9, 0.9, 0.9])
    errors = np.asarray([0.0, 0.0, 9.0])
    words = np.asarray([10.0, 10.0, 10.0])
    # any threshold accepting one 0.9 row accepts all three -> the
    # 30% accepted WER violates the 0.1 target; must refuse
    thr, rate, wer = gc.pick_threshold(conf, errors, words, 0.1)
    assert thr == 2.0


def test_simulate_gate():
    conf = np.asarray([[0.9, 0.1, 0.1],
                       [0.9, 0.9, 0.1]])
    thr = [0.5, 0.5]
    errors = np.asarray([[0.0, 7.0, 7.0],
                         [1.0, 0.0, 2.0]])
    words = np.asarray([10.0, 10.0, 10.0])
    mean_exit, wer, chosen = gc.simulate_gate(conf, thr, errors, words)
    np.testing.assert_array_equal(chosen, [1, 2, 2])
    assert mean_exit == pytest.approx((1 + 2 + 2) / 3)
    assert wer == pytest.approx((0.0 + 0.0 + 2.0) / 30.0)


# ---------- the tool end to end ----------

def test_calibrate_gate_tool_roundtrip(tmp_path):
    """calibrate_gate.py on a tiny untrained checkpoint + synthetic
    data: writes a JSON whose thresholds inference's gate accepts."""
    from early_exit_tpu.training import checkpoint
    import tools.calibrate_gate as tool

    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    ckpt = os.path.join(tmp_path, "mod-tiny")
    checkpoint.save_pytree({"params": params, "model_state": state}, ckpt)

    out = os.path.join(tmp_path, "calib.json")
    report = tool.main([
        "--out", out, "--target_wer_delta", "0.5",
        "--decoder_mode", "ctc",
        "--load_model_path", ckpt, "--synthetic_data", "true",
        "--batch_size", "8", "--n_workers", "0", "--bpe", "false",
        "--d_model", "32", "--n_heads", "4", "--d_feed_forward", "64",
        "--n_enc_exits", "3", "--n_enc_layers_per_exit", "2",
        "--depthwise_kernel_size", "7", "--n_mels", "16",
        "--compute_dtype", "float32",
    ])
    assert os.path.exists(out)
    with open(out) as f:
        calib = json.load(f)
    assert calib["score"] in early_exit_gate.GATE_SCORES
    assert len(calib["thresholds"]) == cfg.n_enc_exits
    assert len(calib["temperatures"]) == cfg.n_enc_exits
    # the quality constraint is RELATIVE to the final exit: every
    # simulated operating point must satisfy it (an untrained model's
    # final WER is ~100%, so early acceptance is legitimately allowed)
    target = calib["final_exit_wer_pct"] + 0.5 + 1e-6
    for s, entry in calib["per_score"].items():
        assert entry["gated_wer_pct"] <= target, s
        assert 1.0 <= entry["mean_exit"] <= cfg.n_enc_exits, s
    # the fitted thresholds drive gated_apply directly
    feats, lengths = _batch(cfg)
    lp, chosen, sub_len, n_run = early_exit_gate.gated_apply(
        params, state, feats, lengths, cfg,
        threshold=calib["thresholds"],
        temperatures=calib["temperatures"], score=calib["score"])
    assert 1 <= int(n_run) <= cfg.n_enc_exits
    assert np.isfinite(np.asarray(lp)).all()


def test_sequential_thresholds_compose_where_per_exit_do_not():
    """Adversarial case: each exit's accepted set individually meets the
    target, but the sequential union exceeds it — the sequential fitter
    must tighten. 3 utts x 10 words, target corpus WER 0.1."""
    conf = np.asarray([[0.9, 0.8, 0.1],     # exit 1 would accept u1,u2
                       [0.9, 0.1, 0.8],     # exit 2 would accept u1,u3
                       [0.9, 0.9, 0.9]])
    errors = np.asarray([[0.0, 2.0, 9.0],
                         [0.0, 9.0, 2.0],
                         [0.0, 0.0, 0.0]])
    words = np.asarray([10.0, 10.0, 10.0])
    # per-exit constraints pass individually (2/20 = 0.1 each)...
    t1, _, _ = gc.pick_threshold(conf[0], errors[0], words, 0.1)
    t2, _, _ = gc.pick_threshold(conf[1], errors[1], words, 0.1)
    assert t1 == 0.8 and t2 == 0.8
    # ...but compose to (2+2)/30 > 0.1
    _, wer_naive, _ = gc.simulate_gate(conf, [t1, t2, 0.0], errors, words)
    assert wer_naive > 0.1
    thr = gc.fit_sequential_thresholds(conf, errors, words, 0.1)
    mean_exit, wer, _ = gc.simulate_gate(conf, thr, errors, words)
    assert wer <= 0.1 + 1e-9
    assert mean_exit < 3.0           # still accepts something early


def test_sequential_thresholds_all_clean_accepts_everything_early():
    conf = np.asarray([[0.9, 0.8], [0.9, 0.9]])
    errors = np.zeros((2, 2))
    words = np.asarray([10.0, 10.0])
    thr = gc.fit_sequential_thresholds(conf, errors, words, 0.0)
    mean_exit, wer, chosen = gc.simulate_gate(conf, thr, errors, words)
    assert mean_exit == 1.0 and wer == 0.0


def test_sequential_thresholds_respect_budget_with_noise():
    """Random instances: the guarantee must hold exactly on the
    calibration set for any target."""
    rng = np.random.RandomState(0)
    for trial in range(20):
        E, N = 4, 60
        conf = rng.uniform(size=(E, N))
        errors = (rng.uniform(size=(E, N)) < 0.3) * \
            rng.randint(1, 5, size=(E, N))
        errors[-1] *= rng.uniform(size=N) < 0.2    # deep exit is better
        words = rng.randint(5, 20, size=N).astype(float)
        final_wer = errors[-1].sum() / words.sum()
        for delta in (0.0, 0.02, 0.1):
            target = final_wer + delta
            thr = gc.fit_sequential_thresholds(conf, errors, words,
                                               target)
            _, wer, _ = gc.simulate_gate(conf, thr, errors, words)
            assert wer <= target + 1e-9, (trial, delta)

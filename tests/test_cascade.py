"""Cascade serving (early_exit_tpu/serving/cascade.py).

The equivalence that makes the cascade legitimate: its per-utterance
exit decisions and decoded posteriors are EXACTLY gated_apply's (the
earliest exit whose calibrated confidence clears its per-exit
threshold, final exit as fallback) — only the computed cost differs
(k exits for accepted rows + a resumed E-exit run for escalated ones,
instead of the while_loop's batch-max everywhere).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import early_conformer, early_exit_gate
from early_exit_tpu.serving import cascade

CFG = ModelConfig(d_model=32, n_enc_exits=4, n_enc_layers_per_exit=1,
                  n_heads=4, d_feed_forward=64, depthwise_kernel_size=7,
                  compute_dtype="float32", residual_dtype="float32",
                  attn_softmax_dtype="float32")


TEMPS = [2.0, 1.5, 1.0, 1.0]


@pytest.fixture(scope="module")
def model():
    params, state = early_conformer.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(1)
    B, T, M = 6, 64, CFG.n_mels
    feats = jnp.asarray(rng.randn(B, T, M).astype(np.float32))
    lengths = jnp.asarray([T, T - 8, T - 16, T, T - 4, T - 30])

    # random-init confidences cluster tightly, so per-exit thresholds
    # are set at quantiles of the model's OWN confidence distribution —
    # guaranteeing the batch splits (some rows accept shallow, some
    # escalate) whatever the init produces
    lp, sub_len, _ = early_conformer.apply(params, state, feats,
                                           lengths, CFG, train=False)
    mask = jnp.arange(lp.shape[2])[None, :] < sub_len[:, None]
    from early_exit_tpu.models import gate_calibration
    thr_by_score = {}
    for score in ("maxprob", "negentropy"):
        conf = np.stack([np.asarray(gate_calibration.scaled_confidence(
            lp[e], mask, score, TEMPS[e])) for e in range(4)])
        thr_by_score[score] = [float(np.quantile(conf[0], 0.5)),
                               float(np.quantile(conf[1], 0.7)),
                               float(np.quantile(conf[2], 0.85)),
                               0.0]
    return params, state, feats, lengths, thr_by_score


@pytest.mark.parametrize("k", [1, 2, 3])
@pytest.mark.parametrize("score", ["maxprob", "negentropy"])
def test_cascade_matches_gated_apply_rowwise(model, k, score):
    params, state, feats, lengths, thr_by_score = model
    THR = thr_by_score[score]
    g_lp, g_chosen, g_sub, _ = early_exit_gate.gated_apply(
        params, state, feats, lengths, CFG, threshold=THR, score=score,
        temperatures=TEMPS)

    a_lp, a_chosen, accepted, sub_len, h_k = cascade.shallow_apply(
        params, state, feats, lengths, CFG, k=k, threshold=THR,
        score=score, temperatures=TEMPS)
    np.testing.assert_array_equal(np.asarray(sub_len), np.asarray(g_sub))

    accepted = np.asarray(accepted)
    chosen = np.asarray(a_chosen).copy()
    lp = np.asarray(a_lp).copy()
    idx, item_mask = cascade.pack_escalation_indices(accepted,
                                                     pack_batch=2)
    if idx.size:
        h_packed = jnp.take(h_k, jnp.asarray(idx), axis=0)
        sl_packed = jnp.take(sub_len, jnp.asarray(idx), axis=0)
        b_lp, b_chosen = cascade.continue_apply(
            params, state, h_packed, sl_packed, CFG, k=k, threshold=THR,
            score=score, temperatures=TEMPS)
        b_lp, b_chosen = np.asarray(b_lp), np.asarray(b_chosen)
        for j, (i, real) in enumerate(zip(idx, item_mask)):
            if real:
                chosen[i] = b_chosen[j]
                lp[i] = b_lp[j]

    np.testing.assert_array_equal(chosen, np.asarray(g_chosen))
    np.testing.assert_allclose(lp, np.asarray(g_lp), rtol=1e-5,
                               atol=1e-5)


def test_the_batch_genuinely_splits(model):
    """The fixture must exercise BOTH paths, or the equivalence test
    proves nothing."""
    params, state, feats, lengths, thr_by_score = model
    _, _, accepted, _, _ = cascade.shallow_apply(
        params, state, feats, lengths, CFG, k=2,
        threshold=thr_by_score["maxprob"], score="maxprob",
        temperatures=TEMPS)
    accepted = np.asarray(accepted)
    assert accepted.any() and (~accepted).any()


def test_item_mask_rows_never_escalate(model):
    params, state, feats, lengths, thr_by_score = model
    im = jnp.asarray([1, 1, 0, 1, 0, 1])
    _, chosen, accepted, _, _ = cascade.shallow_apply(
        params, state, feats, lengths, CFG, k=2,
        threshold=thr_by_score["maxprob"], temperatures=TEMPS,
        item_mask=im)
    accepted, chosen = np.asarray(accepted), np.asarray(chosen)
    assert accepted[2] and accepted[4]
    assert chosen[2] == 0 and chosen[4] == 0


def test_pack_indices_shapes_and_padding():
    acc = np.array([True, False, True, False, False, True, True, False])
    idx, m = cascade.pack_escalation_indices(acc, pack_batch=3)
    assert idx.shape == (6,) and m.shape == (6,)
    np.testing.assert_array_equal(idx[:4], [1, 3, 4, 7])
    np.testing.assert_array_equal(m, [1, 1, 1, 1, 0, 0])
    idx, m = cascade.pack_escalation_indices(np.ones(4, bool), 2)
    assert idx.size == 0 and m.size == 0


def test_choose_k_minimizes_expected_exits():
    # 70% accept at exit 1: cost(1)=1+0.3*5=2.5 beats cost(2)=2.6 etc.
    assert cascade.choose_k([0.7, 0.1, 0.05, 0.05, 0.05, 0.05], 6) == 1
    # nothing accepts shallow: k=1 wastes least on the doomed prefix
    assert cascade.choose_k([0.0] * 6, 6) == 1
    # everything accepts by exit 2
    assert cascade.choose_k([0.4, 0.6, 0, 0, 0, 0], 6) == 2
    # spread: cost(2) = 2 + .35*4 = 3.4 < cost(1)=1+.75*5=4.75,
    # cost(3) = 3 + .15*3 = 3.45
    assert cascade.choose_k([0.25, 0.4, 0.2, 0.1, 0.05, 0.0], 6) == 2


def test_unreachable_threshold_exits_are_skipped_but_equivalent(model):
    """The calibrator emits 2.0 thresholds for never-accept exits; the
    cascade skips those heads at trace time (dead compute) while the
    decisions must still match gated_apply, which computes everything."""
    params, state, feats, lengths, thr_by_score = model
    base = thr_by_score["maxprob"]
    # exit1 and exit3 unreachable: accept at 2 or fall through to 4
    THR = [2.0, base[1], 2.0, 0.0]
    g_lp, g_chosen, _, _ = early_exit_gate.gated_apply(
        params, state, feats, lengths, CFG, threshold=THR,
        temperatures=TEMPS)
    a_lp, a_chosen, accepted, sub_len, h_k = cascade.shallow_apply(
        params, state, feats, lengths, CFG, k=2, threshold=THR,
        temperatures=TEMPS)
    chosen = np.asarray(a_chosen).copy()
    lp = np.asarray(a_lp).copy()
    idx, pm = cascade.pack_escalation_indices(np.asarray(accepted), 2)
    assert (np.asarray(a_chosen)[np.asarray(accepted)] == 2).all()
    if idx.size:
        b_lp, b_chosen = cascade.continue_apply(
            params, state, jnp.take(h_k, jnp.asarray(idx), axis=0),
            jnp.take(sub_len, jnp.asarray(idx), axis=0), CFG, k=2,
            threshold=THR, temperatures=TEMPS)
        for j, (i, real) in enumerate(zip(idx, pm)):
            if real:
                chosen[i] = np.asarray(b_chosen)[j]
                lp[i] = np.asarray(b_lp)[j]
    np.testing.assert_array_equal(chosen, np.asarray(g_chosen))
    np.testing.assert_allclose(lp, np.asarray(g_lp), rtol=1e-5,
                               atol=1e-5)
    # the skip is real: unreachable exits produce -inf confidence
    reach = cascade._reachable(THR, 0, 4)
    assert reach == [False, True, False, True]
    assert cascade._reachable(jnp.asarray(THR), 0, 4) == [True] * 4


def test_rejects_single_exit_and_bad_k(model):
    params, state, feats, lengths, _ = model
    with pytest.raises(ValueError, match="k must be"):
        cascade.shallow_apply(params, state, feats, lengths, CFG, k=4,
                              threshold=0.5)
    bad = ModelConfig(model_type="early_zipformer")
    with pytest.raises(ValueError, match="cascade serving supports"):
        cascade.shallow_apply(params, state, feats, lengths, bad, k=1,
                              threshold=0.5)

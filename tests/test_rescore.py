"""Joint CTC+attention rescoring (decoding/rescore.py) — the reference's
commented-out util/beam_infer.py:309-383 branch, completed."""

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.decoding import aed_beam, rescore
from early_exit_tpu.models import full_conformer
from early_exit_tpu.ops.ctc import ctc_neg_log_likelihood

TINY = ModelConfig(model_type="full_conformer", d_model=32, n_heads=4,
                   d_feed_forward=64, n_enc_exits=2,
                   n_enc_layers_per_exit=1, n_dec_layers=2,
                   depthwise_kernel_size=7, vocab_size=24, n_mels=8,
                   compute_dtype="float32", drop_prob=0.0,
                   pad_id=20, bos_id=1, eos_id=2)


def test_joint_rescore_matches_reference_formula():
    """At safe magnitudes the stable exp(s - max) form must equal the
    reference's literal exp(s)/max(exp(s)) mixing."""
    rng = np.random.RandomState(0)
    aed = rng.uniform(-3, 0, size=(6,))
    ctc = rng.uniform(-3, 0, size=(6,))
    w = 0.4
    s_pred = np.exp(aed) / np.exp(aed).max()
    s_ctc = np.exp(ctc) / np.exp(ctc).max()
    want = w * s_ctc + (1 - w) * s_pred
    best, got = rescore.joint_rescore(jnp.asarray(aed), jnp.asarray(ctc), w)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    assert int(best) == int(np.argmax(want))


def test_joint_rescore_weight_extremes():
    aed = jnp.asarray([-1.0, -0.5, -2.0])
    ctc = jnp.asarray([-0.2, -3.0, -0.1])
    best0, _ = rescore.joint_rescore(aed, ctc, 0.0)
    best1, _ = rescore.joint_rescore(aed, ctc, 1.0)
    assert int(best0) == 1      # pure attention ranking
    assert int(best1) == 2      # pure CTC ranking


def test_joint_rescore_stable_at_extreme_magnitudes():
    """Scores around -2000 underflow the literal exp(); the stable form
    must still rank correctly (0/0 would yield nan)."""
    aed = jnp.asarray([-2000.0, -2010.0, -2020.0])
    ctc = jnp.asarray([-1990.0, -1980.0, -2000.0])
    best, s = rescore.joint_rescore(aed, ctc, 0.5)
    assert np.all(np.isfinite(np.asarray(s)))
    # lane 0 max-normalizes to 1.0 on aed; lane 1 to 1.0 on ctc;
    # 0.5*exp(-10)+0.5*1 (lane 0) vs 0.5*1+0.5*exp(-10) (lane 1): tie
    # broken toward the first, so just check no-nan argmax validity
    assert 0 <= int(best) < 3


def test_ctc_lane_scores_is_normalized_forward():
    rng = np.random.RandomState(1)
    T, V, K, L = 12, 8, 3, 5
    logits = rng.randn(T, V).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    toks = jnp.asarray(rng.randint(1, V, size=(K, L)), jnp.int32)
    lens = jnp.asarray([5, 3, 4], jnp.int32)
    got = rescore.ctc_lane_scores(logp, jnp.asarray(T), toks, lens)
    lp_b = jnp.broadcast_to(logp[None], (K, T, V))
    nll = ctc_neg_log_likelihood(lp_b, jnp.full((K,), T, jnp.int32),
                                 toks, lens)
    want = -np.asarray(nll) / np.asarray(lens)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def _peaked_emission(seq, T, V, blank=0, hi=8.0):
    """Emission whose per-frame argmax spells `seq` (blank-separated)."""
    em = np.full((T, V), -hi, np.float32)
    em[:, blank] = hi
    t = 1
    for s in seq:
        em[t, blank] = -hi
        em[t, s] = hi
        t += 2
    return jax.nn.log_softmax(jnp.asarray(em), axis=-1)


def test_rescore_flips_to_ctc_preferred_hypothesis():
    """AED ranks the wrong hypothesis first; the CTC emission strongly
    prefers the truth — joint rescoring must flip the ranking."""
    V, T = 10, 16
    truth = [3, 4, 5]
    wrong = [3, 4, 6]
    logp = _peaked_emission(truth, T, V)
    toks = jnp.asarray([wrong + [0, 0], truth + [0, 0]], jnp.int32)
    lens = jnp.asarray([3, 3], jnp.int32)
    aed = jnp.asarray([-0.5, -1.5])       # attention prefers `wrong`
    best, _, ctc_s = rescore.rescore_batch(
        logp[None], jnp.asarray([T]), toks[None], lens[None], aed[None],
        ctc_weight=0.7)
    assert int(best[0]) == 1
    assert float(ctc_s[0, 1]) > float(ctc_s[0, 0])
    # and with the CTC evidence ignored the attention ranking stands
    best0, _, _ = rescore.rescore_batch(
        logp[None], jnp.asarray([T]), toks[None], lens[None], aed[None],
        ctc_weight=0.0)
    assert int(best0[0]) == 0


def test_rescore_batch_matches_single():
    rng = np.random.RandomState(2)
    B, T, V, K, L = 2, 10, 7, 4, 6
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(B, T, V).astype(np.float32)), axis=-1)
    toks = jnp.asarray(rng.randint(1, V, size=(B, K, L)), jnp.int32)
    lens = jnp.asarray(rng.randint(1, L + 1, size=(B, K)), jnp.int32)
    aed = jnp.asarray(rng.randn(B, K).astype(np.float32))
    nf = jnp.asarray([10, 7], jnp.int32)
    best, s, ctc_s = rescore.rescore_batch(logp, nf, toks, lens, aed,
                                           ctc_weight=0.3)
    for b in range(B):
        one = rescore.ctc_lane_scores(logp[b], nf[b], toks[b], lens[b])
        np.testing.assert_allclose(np.asarray(ctc_s[b]), np.asarray(one),
                                   rtol=1e-6)
        bb, ss = rescore.joint_rescore(aed[b], one, 0.3)
        assert int(best[b]) == int(bb)


def test_rescore_on_real_beam_output():
    """End-to-end shape/validity: tiny full_conformer, batched beam,
    rescore over the real (B, K, L) lanes."""
    cfg = TINY
    params, state = full_conformer.init(jax.random.PRNGKey(0), cfg)
    B, T = 2, 50
    feats = jnp.asarray(
        np.random.RandomState(3).randn(B, T, cfg.n_mels).astype(np.float32))
    lengths = jnp.asarray([T, T - 10], jnp.int32)
    exit_hidden, sub_len, _, _ = full_conformer.encode(
        params, state, feats, lengths, cfg, train=False)
    n = 1
    toks, lens, scores, best = aed_beam.beam_search_exit_batch(
        params, exit_hidden[n - 1], jnp.asarray([2, 2]), cfg, n_exit=n,
        beam_size=3, max_length=8)
    from early_exit_tpu.models.early_conformer import apply_heads
    ctc_logp = apply_heads(params["heads"], exit_hidden, cfg)
    rbest, s, _ = rescore.rescore_batch(
        ctc_logp[n - 1], sub_len, toks, lens, scores, ctc_weight=0.3,
        blank=cfg.blank_id)
    assert rbest.shape == (B,)
    assert np.all((np.asarray(rbest) >= 0) & (np.asarray(rbest) < 3))
    assert np.all(np.isfinite(np.asarray(s)))


def test_cli_flag_parses():
    from early_exit_tpu.cli import get_parser
    base = ["--decoder_mode", "aed"]
    args = get_parser().parse_args(base + ["--rescore_ctc_weight", "0.3"])
    assert args.rescore_ctc_weight == 0.3
    assert get_parser().parse_args(base).rescore_ctc_weight == 0.0

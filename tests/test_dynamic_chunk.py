"""Dynamic-chunk streaming training (--dynamic_chunk_training).

WeNet-U2-style recipe: each train step samples a chunked self-attention
mask (or full attention, 50%), so one checkpoint serves both
whole-utterance and streaming inference. Pinned here: mask pattern
correctness, degenerate-mask equivalence to full attention, the train
step running end-to-end with masks engaged, and the mask actually
changing the forward (attention truncation is real).
"""

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.configs import ModelConfig, TrainConfig
from early_exit_tpu.models import early_conformer
from early_exit_tpu.models.registry import build_model
from early_exit_tpu.optim import make_optimizer
from early_exit_tpu.training import trainer

CFG = ModelConfig(d_model=32, n_heads=4, d_feed_forward=64,
                  n_enc_exits=2, n_enc_layers_per_exit=1,
                  depthwise_kernel_size=7, vocab_size=32,
                  compute_dtype="float32")


def _batch(B=2, T=101, F=80, L=8, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "feats": jnp.asarray(rng.randn(B, T, F).astype(np.float32)),
        "feat_lengths": jnp.asarray(np.full((B,), T, np.int32)),
        "labels": jnp.asarray(rng.randint(3, 30, (B, L)).astype(np.int32)),
        "label_lengths": jnp.asarray(np.full((B,), L, np.int32)),
        "item_mask": jnp.asarray(np.ones((B,), np.float32)),
    }


def test_chunk_mask_pattern():
    got = np.asarray(trainer.make_chunk_mask(10, 4, chunk_left=1))
    qc = np.arange(10)[:, None] // 4
    kc = np.arange(10)[None, :] // 4
    want = (kc <= qc) & (qc - kc <= 1)
    np.testing.assert_array_equal(got, want)
    # in-chunk lookahead: frame 0 sees frames 1-3 (same chunk)
    assert got[0, 3] and not got[0, 4]
    # left context of 1 chunk: frame 8 sees chunk 1 (frames 4-7) but not 0
    assert got[8, 4] and not got[8, 3]


def test_streaming_causal_window_mask_matches_training_pattern():
    """The serving causal_attention mask must equal make_chunk_mask's
    allowed pairs on the window's global positions (unbounded left —
    window truncation supplies the left bound)."""
    Ls, Cs, Rs = 6, 3, 2
    k = Ls + Cs + Rs
    qc = (np.arange(k) - Ls) // Cs            # serving/streaming.py
    got = qc[None, :] <= qc[:, None]
    g = 7                                     # arbitrary window position
    gpos = g * Cs - Ls + np.arange(k)
    want = np.asarray(trainer.make_chunk_mask(
        int(gpos[-1]) + 1, Cs, chunk_left=10**6))[gpos[:, None],
                                                  gpos[None, :]]
    np.testing.assert_array_equal(got, want)


def test_full_chunk_mask_equals_no_mask():
    params, state = early_conformer.init(jax.random.PRNGKey(0), CFG)
    b = _batch()
    t_sub = ((101 - 3) // 2 + 1 - 3) // 2 + 1
    full = jnp.ones((t_sub, t_sub), bool)
    lp_a, sl_a, _ = early_conformer.apply(
        params, state, b["feats"], b["feat_lengths"], CFG, train=False)
    lp_b, sl_b, _ = early_conformer.apply(
        params, state, b["feats"], b["feat_lengths"], CFG, train=False,
        attn_mask=full)
    np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_b),
                               rtol=1e-6, atol=1e-6)


def test_chunk_mask_changes_forward():
    params, state = early_conformer.init(jax.random.PRNGKey(0), CFG)
    b = _batch()
    t_sub = ((101 - 3) // 2 + 1 - 3) // 2 + 1
    qc = jnp.arange(t_sub)[:, None] // 4
    kc = jnp.arange(t_sub)[None, :] // 4
    chunked = (kc <= qc) & (qc - kc <= 1)
    lp_a, *_ = early_conformer.apply(
        params, state, b["feats"], b["feat_lengths"], CFG, train=False)
    lp_b, *_ = early_conformer.apply(
        params, state, b["feats"], b["feat_lengths"], CFG, train=False,
        attn_mask=chunked)
    assert np.abs(np.asarray(lp_a) - np.asarray(lp_b)).max() > 1e-4


def test_dynamic_chunk_train_step_runs_and_learns():
    tcfg = TrainConfig(decoder_mode="ctc", dynamic_chunk=True,
                       fast_rng=True)
    model = build_model(CFG)
    opt = make_optimizer(32, 10)
    params, mstate = model.init(jax.random.PRNGKey(0), CFG)
    state = {"params": params, "model_state": mstate,
             "opt_state": opt.init(params),
             "step": jnp.zeros((), jnp.int32)}
    step = jax.jit(trainer.make_train_step(model, CFG, tcfg, opt))
    b = _batch()
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        state, m = step(state, b, rng)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

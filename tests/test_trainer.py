import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.configs import ModelConfig, TrainConfig
from early_exit_tpu.models import early_conformer
from early_exit_tpu.optim import make_optimizer, noam_schedule
from early_exit_tpu.training import trainer

TINY = ModelConfig(d_model=32, n_heads=4, d_feed_forward=64,
                   n_enc_exits=2, n_enc_layers_per_exit=1,
                   depthwise_kernel_size=7, vocab_size=16, n_mels=8,
                   compute_dtype="float32", drop_prob=0.0)


def _synthetic_batch(cfg, B=4, T=67, L=6, seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(B, T, cfg.n_mels).astype(np.float32)
    labels = rng.randint(3, cfg.vocab_size, size=(B, L))
    return {
        "feats": jnp.asarray(feats),
        "feat_lengths": jnp.asarray([T, T, T - 10, T - 20]),
        "labels": jnp.asarray(labels),
        "label_lengths": jnp.asarray([L, L - 1, L - 2, 4]),
    }


def test_noam_schedule_matches_reference_formula():
    sched = noam_schedule(256, warmup=4000)
    for step in (1, 100, 4000, 20000):
        expect = 256 ** -0.5 * min(step ** -0.5, step * 4000 ** -1.5)
        got = float(sched(step - 1))
        np.testing.assert_allclose(got, expect, rtol=1e-6)


@pytest.mark.slow
def test_loss_decreases_overfitting():
    cfg = TINY
    tcfg = TrainConfig(ctc_compat_padded_lengths=True)
    opt = make_optimizer(cfg.d_model, warmup=10, clip=1.0)
    state = trainer.create_train_state(jax.random.PRNGKey(0),
                                       early_conformer, cfg, opt)
    step = jax.jit(trainer.make_train_step(early_conformer, cfg, tcfg, opt))
    batch = _synthetic_batch(cfg)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.6, losses[:3] + losses[-3:]


def test_metrics_shapes():
    cfg = TINY
    tcfg = TrainConfig()
    opt = make_optimizer(cfg.d_model, warmup=10)
    state = trainer.create_train_state(jax.random.PRNGKey(0),
                                       early_conformer, cfg, opt)
    step = jax.jit(trainer.make_train_step(early_conformer, cfg, tcfg, opt))
    state, metrics = step(state, _synthetic_batch(cfg), jax.random.PRNGKey(1))
    assert metrics["loss_per_exit"].shape == (cfg.n_enc_exits,)
    assert int(metrics["step"]) == 1
    assert float(metrics["grad_norm"]) > 0


def test_bfloat16_train_step_runs():
    """Regression: bf16 compute + f32 params must differentiate (the conv
    transpose used to see mixed dtypes)."""
    import dataclasses
    cfg = dataclasses.replace(TINY, compute_dtype="bfloat16")
    tcfg = TrainConfig()
    opt = make_optimizer(cfg.d_model, warmup=10)
    state = trainer.create_train_state(jax.random.PRNGKey(0),
                                       early_conformer, cfg, opt)
    step = jax.jit(trainer.make_train_step(early_conformer, cfg, tcfg, opt))
    state, m = step(state, _synthetic_batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_remat_matches_no_remat():
    import dataclasses
    cfg = TINY
    cfg_r = dataclasses.replace(TINY, remat=True)
    tcfg = TrainConfig()
    opt = make_optimizer(cfg.d_model, warmup=10)
    state = trainer.create_train_state(jax.random.PRNGKey(0),
                                       early_conformer, cfg, opt)
    batch = _synthetic_batch(cfg)
    s1, m1 = jax.jit(trainer.make_train_step(early_conformer, cfg, tcfg,
                                             opt))(state, batch,
                                                   jax.random.PRNGKey(1))
    s2, m2 = jax.jit(trainer.make_train_step(early_conformer, cfg_r, tcfg,
                                             opt))(state, batch,
                                                   jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-4)


@pytest.mark.slow
def test_distillation_loss_and_training():
    import dataclasses
    cfg = TINY
    batch = _synthetic_batch(cfg)
    # KL of the teacher with itself is 0; earlier exits give positive KL
    import jax.numpy as jnp
    from early_exit_tpu.training.trainer import distill_loss
    E, B, T, V = 3, 2, 5, 8
    rng = np.random.RandomState(0)
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(E, B, T, V)), axis=-1)
    sub_len = jnp.asarray([T, T - 2])
    kl = float(distill_loss(lp, sub_len))
    assert kl > 0
    same = jnp.broadcast_to(lp[-1:], lp.shape)
    np.testing.assert_allclose(float(distill_loss(same, sub_len)), 0.0,
                               atol=1e-6)

    # training with distillation still decreases the loss
    tcfg = TrainConfig(distill=True, distill_weight=0.5)
    opt = make_optimizer(cfg.d_model, warmup=10)
    state = trainer.create_train_state(jax.random.PRNGKey(0),
                                       early_conformer, cfg, opt)
    step = jax.jit(trainer.make_train_step(early_conformer, cfg, tcfg, opt))
    losses = []
    for _ in range(10):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

"""SpecAugment masking (ops/specaugment.py) — beyond-reference feature.

The reference has no feature augmentation (util/data_loader.py:7-18);
these tests pin the op's contract: shape/dtype preservation, masking
confined to valid frames, zero-config identity, determinism, and the
trainer wiring (specaugment=True trains and changes the loss).
"""

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.configs import ModelConfig, TrainConfig
from early_exit_tpu.ops import specaugment


def _feats(B=3, T=50, F=16, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(B, T, F).astype(np.float32) + 1.0)


def test_shape_dtype_and_some_masking():
    feats = _feats()
    lengths = jnp.asarray([50, 30, 10])
    out = specaugment.apply(jax.random.PRNGKey(0), feats, lengths)
    assert out.shape == feats.shape and out.dtype == feats.dtype
    # with inputs all >= 1.0, masked cells are exactly 0
    assert float(jnp.sum(out == 0.0)) > 0


def test_disabled_is_identity():
    feats = _feats()
    lengths = jnp.asarray([50, 30, 10])
    out = specaugment.apply(jax.random.PRNGKey(0), feats, lengths,
                            n_freq_masks=0, n_time_masks=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))


def test_deterministic_per_key():
    feats = _feats()
    lengths = jnp.asarray([50, 30, 10])
    a = specaugment.apply(jax.random.PRNGKey(7), feats, lengths)
    b = specaugment.apply(jax.random.PRNGKey(7), feats, lengths)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = specaugment.apply(jax.random.PRNGKey(8), feats, lengths)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_time_masks_stay_inside_valid_frames():
    feats = _feats(B=2, T=64, F=8, seed=1)
    lengths = jnp.asarray([20, 64])
    # freq masks off: only time masks can zero anything
    for seed in range(20):
        out = specaugment.apply(jax.random.PRNGKey(seed), feats, lengths,
                                n_freq_masks=0, n_time_masks=2,
                                time_mask_frac=0.5)
        # frames at/after the valid length of item 0 are untouched
        np.testing.assert_array_equal(np.asarray(out[0, 20:]),
                                      np.asarray(feats[0, 20:]))


def test_freq_mask_width_bound():
    feats = _feats(B=1, T=8, F=32, seed=2)
    lengths = jnp.asarray([8])
    for seed in range(20):
        out = specaugment.apply(jax.random.PRNGKey(seed), feats, lengths,
                                n_freq_masks=1, freq_mask_width=4,
                                n_time_masks=0)
        zero_bins = np.where(np.all(np.asarray(out) == 0.0, axis=(0, 1)))[0]
        assert len(zero_bins) <= 4
        if len(zero_bins) > 1:           # masked bins are contiguous
            assert zero_bins[-1] - zero_bins[0] == len(zero_bins) - 1


def test_trainer_wiring_changes_loss_and_trains():
    from early_exit_tpu.models.registry import build_model
    from early_exit_tpu.optim.noam import make_optimizer
    from early_exit_tpu.training import trainer

    cfg = ModelConfig(d_model=32, n_heads=4, d_feed_forward=64,
                      n_enc_exits=2, n_enc_layers_per_exit=1,
                      depthwise_kernel_size=7, vocab_size=24, n_mels=16,
                      compute_dtype="float32")
    rng = np.random.RandomState(0)
    batch = {
        "feats": jnp.asarray(rng.rand(2, 61, 16).astype(np.float32)),
        "feat_lengths": jnp.asarray([61, 40]),
        "labels": jnp.asarray([[1, 5, 6, 2], [1, 7, 2, 0]]),
        "label_lengths": jnp.asarray([4, 3]),
    }
    model = build_model(cfg)
    losses = {}
    for sa in (False, True):
        tcfg = TrainConfig(specaugment=sa, sa_time_frac=0.3,
                           n_batch_split=1)
        opt = make_optimizer(cfg.d_model, warmup=10)
        state = trainer.create_train_state(jax.random.PRNGKey(0), model,
                                           cfg, opt)
        step = jax.jit(trainer.make_train_step(model, cfg, tcfg, opt))
        state, metrics = step(state, batch, jax.random.PRNGKey(3))
        losses[sa] = float(metrics["loss"])
        assert np.isfinite(losses[sa])
    assert losses[True] != losses[False]   # masking actually reached the model

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.configs import ModelConfig, TrainConfig
from early_exit_tpu.models import splitformer, zipformer
from early_exit_tpu.models.registry import build_model
from early_exit_tpu.optim import make_optimizer
from early_exit_tpu.training import trainer

SPLIT_TINY = ModelConfig(model_type="splitformer", d_model=32, n_heads=4,
                         d_feed_forward=64, n_enc_exits=3,
                         n_enc_layers_per_exit=1, depthwise_kernel_size=7,
                         vocab_size=24, n_mels=8, compute_dtype="float32",
                         drop_prob=0.0)

ZIP_TINY = ModelConfig(model_type="early_zipformer", d_model=32, n_heads=4,
                       d_feed_forward=64, n_enc_exits=19,
                       n_enc_layers_per_exit=1, depthwise_kernel_size=7,
                       vocab_size=24, n_mels=8, compute_dtype="float32",
                       drop_prob=0.0)


def _feats(cfg, B=2, T=77, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(B, T, cfg.n_mels).astype(np.float32)),
            jnp.asarray([T, T - 24]))


def test_registry():
    assert build_model(SPLIT_TINY) is splitformer
    assert build_model(ZIP_TINY) is zipformer


def test_splitformer_shapes():
    cfg = SPLIT_TINY
    params, state = splitformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _feats(cfg)
    logp, sub_len, new_state = splitformer.apply(params, state, feats,
                                                 lengths, cfg)
    t_sub = ((77 - 3) // 2 + 1 - 3) // 2 + 1
    assert logp.shape == (3, 2, t_sub, cfg.vocab_size)
    np.testing.assert_allclose(np.asarray(jnp.exp(logp).sum(-1)), 1.0,
                               atol=1e-4)


def test_splitformer_branch_changes_first_and_last_exits():
    """Zeroing the parallel-branch output projections must change exits 0
    and E-1 but not the middle exit."""
    cfg = SPLIT_TINY
    params, state = splitformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _feats(cfg)
    base, _, _ = splitformer.apply(params, state, feats, lengths, cfg)

    import jax.tree_util as jtu
    zeroed = jtu.tree_map(lambda x: x, params)
    for bi in range(2):
        # zero the branch block entirely: its conformer block must output
        # layer-norm of something — instead scale final_ln weights to zero
        zeroed["parallel"][bi] = jtu.tree_map(jnp.zeros_like,
                                              params["parallel"][bi])
    out, _, _ = splitformer.apply(zeroed, state, feats, lengths, cfg)
    # exit 1 (middle): its stack input changed only via exit 0's branch add,
    # so it DOES change; but exits 0 and 2 must definitely change.
    assert not np.allclose(np.asarray(base[0]), np.asarray(out[0]))
    assert not np.allclose(np.asarray(base[2]), np.asarray(out[2]))


@pytest.mark.slow
def test_splitformer_trains():
    cfg = SPLIT_TINY
    tcfg = TrainConfig()
    opt = make_optimizer(cfg.d_model, warmup=10)
    state = trainer.create_train_state(jax.random.PRNGKey(0), splitformer,
                                       cfg, opt)
    step = jax.jit(trainer.make_train_step(splitformer, cfg, tcfg, opt))
    feats, lengths = _feats(cfg, B=2)
    batch = {"feats": feats, "feat_lengths": lengths,
             "labels": jnp.asarray([[3, 4, 5, 6], [7, 8, 9, 10]]),
             "label_lengths": jnp.asarray([4, 3])}
    losses = []
    rng = jax.random.PRNGKey(1)
    for _ in range(15):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_zipformer_shapes_single_exit():
    cfg = ZIP_TINY
    params, state = zipformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _feats(cfg, T=77)
    logp, out_len, _ = zipformer.apply(params, state, feats, lengths, cfg)
    t_sub = (77 - 3) // 2 + 1           # single conv subsample
    t_out = (t_sub + 1) // 2            # output downsample x2
    assert logp.shape == (1, 2, t_out, cfg.vocab_size)
    np.testing.assert_allclose(np.asarray(jnp.exp(logp).sum(-1)), 1.0,
                               atol=1e-4)


def test_zipformer_requires_19_exits():
    import pytest
    bad = dataclasses.replace(ZIP_TINY, n_enc_exits=6)
    with pytest.raises(ValueError):
        zipformer.init(jax.random.PRNGKey(0), bad)


@pytest.mark.slow
def test_zipformer_trains():
    cfg = ZIP_TINY
    tcfg = TrainConfig()
    opt = make_optimizer(cfg.d_model, warmup=10)
    state = trainer.create_train_state(jax.random.PRNGKey(0), zipformer,
                                       cfg, opt)
    step = jax.jit(trainer.make_train_step(zipformer, cfg, tcfg, opt))
    feats, lengths = _feats(cfg, B=2)
    batch = {"feats": feats, "feat_lengths": lengths,
             "labels": jnp.asarray([[3, 4, 5, 6], [7, 8, 9, 10]]),
             "label_lengths": jnp.asarray([4, 3])}
    losses = []
    rng = jax.random.PRNGKey(1)
    for _ in range(12):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_zoo_bfloat16_forward():
    """All three families run with the bf16 residual-stream defaults."""
    import numpy as _np
    for cfg in (dataclasses.replace(SPLIT_TINY, compute_dtype="bfloat16"),
                dataclasses.replace(ZIP_TINY, compute_dtype="bfloat16")):
        mod = build_model(cfg)
        params, state = mod.init(jax.random.PRNGKey(0), cfg)
        feats, lengths = _feats(cfg)
        logp, sub_len, _ = mod.apply(params, state, feats, lengths, cfg)
        assert _np.isfinite(_np.asarray(logp, _np.float32)).all()


@pytest.mark.parametrize("mod,cfg", [(splitformer, SPLIT_TINY),
                                     (zipformer, ZIP_TINY)])
def test_logits_head_mode(mod, cfg):
    """apply(log_probs=False) returns raw logits whose log_softmax is
    the default output (greedy decode is argmax-identical on either)."""
    p, s = mod.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _feats(cfg)
    lp, sl, _ = mod.apply(p, s, feats, lengths, cfg)
    lg, sl2, _ = mod.apply(p, s, feats, lengths, cfg, log_probs=False)
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(sl2))
    np.testing.assert_allclose(
        np.asarray(jax.nn.log_softmax(lg.astype(jnp.float32), -1)),
        np.asarray(lp), atol=1e-5)

import os

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import early_conformer
from early_exit_tpu.training import checkpoint

TINY = ModelConfig(d_model=16, n_heads=2, d_feed_forward=32,
                   n_enc_exits=2, n_enc_layers_per_exit=1,
                   depthwise_kernel_size=3, vocab_size=8, n_mels=4,
                   compute_dtype="float32")


def test_save_load_roundtrip(tmp_path):
    params, state = early_conformer.init(jax.random.PRNGKey(0), TINY)
    d = str(tmp_path / "ckpt")
    checkpoint.save_epoch(d, 3, params, state)
    p2, s2 = checkpoint.load_epoch(d, 3, params, state)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_avg_models(tmp_path):
    d = str(tmp_path / "ckpt")
    params, state = early_conformer.init(jax.random.PRNGKey(0), TINY)
    # epochs 0,1,2 with params scaled by 1x, 2x, 3x -> average = 2x
    for epoch, scale in [(0, 1.0), (1, 2.0), (2, 3.0)]:
        scaled = jax.tree_util.tree_map(lambda x: x * scale, params)
        checkpoint.save_epoch(d, epoch, scaled, state)
    avg_p, _ = checkpoint.avg_models(d, 0, 2, params, state)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(avg_p)):
        np.testing.assert_allclose(np.asarray(a) * 2.0, np.asarray(b),
                                   rtol=1e-6)


def test_avg_models_skips_missing(tmp_path):
    d = str(tmp_path / "ckpt")
    params, state = early_conformer.init(jax.random.PRNGKey(0), TINY)
    checkpoint.save_epoch(d, 0, params, state)
    checkpoint.save_epoch(d, 4, jax.tree_util.tree_map(lambda x: x * 3.0,
                                                       params), state)
    avg_p, _ = checkpoint.avg_models(d, 0, 4, params, state)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(avg_p)):
        np.testing.assert_allclose(np.asarray(a) * 2.0, np.asarray(b),
                                   rtol=1e-6)


def test_latest_epoch(tmp_path):
    d = str(tmp_path / "ckpt")
    assert checkpoint.latest_epoch(d) is None
    params, state = early_conformer.init(jax.random.PRNGKey(0), TINY)
    checkpoint.save_epoch(d, 0, params, state)
    checkpoint.save_epoch(d, 7, params, state)
    assert checkpoint.latest_epoch(d) == 7


def test_avg_models_start_after_end_raises(tmp_path):
    import pytest
    params, state = early_conformer.init(jax.random.PRNGKey(0), TINY)
    with pytest.raises(ValueError):
        checkpoint.avg_models(str(tmp_path), 5, 2, params, state)


def test_avg_models_empty_dir_raises(tmp_path):
    import pytest
    params, state = early_conformer.init(jax.random.PRNGKey(0), TINY)
    with pytest.raises(FileNotFoundError):
        checkpoint.avg_models(str(tmp_path), 0, 3, params, state)


def test_loads_return_device_arrays(tmp_path):
    """Loaded checkpoints must be committed jax.Arrays, NOT host numpy:
    numpy leaves passed as jit arguments re-upload the whole model on
    every dispatch (measured 62 MB/call -> ~1 s per pooled streaming
    round over the device relay; BENCH_NOTES 'churn load test')."""
    d = str(tmp_path / "ckpt")
    params, state = early_conformer.init(jax.random.PRNGKey(0), TINY)
    checkpoint.save_epoch(d, 0, params, state)
    checkpoint.save_epoch(d, 1, params, state)

    for p, s in (checkpoint.load_epoch(d, 1, params, state),
                 checkpoint.load_model_file(
                     checkpoint.model_ckpt_path(d, 1), params, state),
                 checkpoint.avg_models(d, 0, 1, params, state)):
        for leaf in jax.tree_util.tree_leaves((p, s)):
            assert isinstance(leaf, jax.Array), type(leaf)


def test_avg_models_accumulates_wide_for_bf16(tmp_path):
    """Averaging a window of identical bf16 checkpoints must return the
    common value EXACTLY — bf16-dtype accumulation drifts (each add and
    the /count round at 8 mantissa bits; the reference sums fp32
    torch tensors, util/model_utils.py:28-46)."""
    import jax.numpy as jnp

    d = str(tmp_path)
    val = jnp.full((7, 5), 0.1, jnp.bfloat16)
    template = {"w": jnp.zeros((7, 5), jnp.bfloat16)}
    for epoch in range(20):
        checkpoint.save_epoch(d, epoch, {"w": val}, {})
    params, _ = checkpoint.avg_models(d, 0, 19, template, {})
    assert params["w"].dtype == jnp.bfloat16
    assert (np.asarray(params["w"], np.float32)
            == np.asarray(val, np.float32)).all()


def test_prune_old_retention(tmp_path):
    """--keep_last_ckpts semantics: keep the newest N SAVED epochs
    (save-on-best makes epoch numbers sparse), delete model+optimizer
    pairs together, never touch protected epochs."""
    d = str(tmp_path / "ckpt")
    params, state = early_conformer.init(jax.random.PRNGKey(0), TINY)
    for e in (0, 2, 5, 9, 12):   # sparse, as save-on-best produces
        checkpoint.save_epoch(d, e, params, state, opt_state={"x": 1},
                              step=e)

    assert checkpoint.prune_old(d, 0) == []          # 0 = keep all
    assert checkpoint.saved_epochs(d) == [0, 2, 5, 9, 12]

    # keep newest 3 saved = {5, 9, 12}; epoch 2 is protected
    assert checkpoint.prune_old(d, 3, protect=(2,)) == [0]
    assert checkpoint.saved_epochs(d) == [2, 5, 9, 12]
    assert checkpoint.prune_old(d, 2) == [2, 5]
    assert checkpoint.saved_epochs(d) == [9, 12]
    # optimizer files pruned alongside
    assert not os.path.exists(checkpoint.opt_ckpt_path(d, 0))
    assert os.path.exists(checkpoint.opt_ckpt_path(d, 9))
    # auto-resume still finds the newest pair
    assert checkpoint.latest_epoch(d) == 12

    assert checkpoint.prune_old(d, 10) == []         # fewer than keep

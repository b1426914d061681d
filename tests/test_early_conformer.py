import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import early_conformer

TINY = ModelConfig(d_model=32, n_heads=4, d_feed_forward=64,
                   n_enc_exits=3, n_enc_layers_per_exit=2,
                   depthwise_kernel_size=7, vocab_size=40, n_mels=16,
                   compute_dtype="float32")


def _batch(cfg, B=2, T=61, seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, T, cfg.n_mels).astype(np.float32))
    lengths = jnp.asarray([T, T - 20])
    return feats, lengths


def test_forward_shapes():
    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    logp, sub_len, _ = early_conformer.apply(params, state, feats, lengths, cfg)
    t_sub = ((61 - 3) // 2 + 1 - 3) // 2 + 1
    assert logp.shape == (3, 2, t_sub, cfg.vocab_size)
    # log_softmax normalisation
    s = jnp.exp(logp).sum(-1)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-4)
    # reference length rule: clamp(len/4)
    np.testing.assert_array_equal(np.asarray(sub_len), [t_sub, (61 - 20) // 4])


def test_padding_invariance():
    """Frames beyond an item's length must not change its outputs.

    Uses length_mode="true" (exact conv arithmetic): under the reference's
    clamp(len/4) rule the last admitted frame's receptive field straddles
    the padding by construction, so strict invariance is impossible there.
    """
    import dataclasses
    cfg = dataclasses.replace(TINY, length_mode="true")
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, _ = _batch(cfg)
    lengths = jnp.asarray([61, 41])
    logp_a, sub_len, _ = early_conformer.apply(params, state, feats, lengths, cfg)

    # corrupt the padding region of item 1 (valid frames = 41)
    feats_b = feats.at[1, 41:, :].set(99.0)
    logp_b, _, _ = early_conformer.apply(params, state, feats_b, lengths, cfg)

    n_valid = int(sub_len[1])
    np.testing.assert_allclose(np.asarray(logp_a[:, 1, :n_valid]),
                               np.asarray(logp_b[:, 1, :n_valid]),
                               atol=2e-4)
    # item 0 untouched in both
    np.testing.assert_allclose(np.asarray(logp_a[:, 0]),
                               np.asarray(logp_b[:, 0]), atol=1e-5)


def test_exit_prefix_property():
    """Exit n computed via encode_exit equals row n of the full forward."""
    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(1), cfg)
    feats, lengths = _batch(cfg, seed=1)
    full, _, _ = early_conformer.apply(params, state, feats, lengths, cfg)
    for n in (1, 2, 3):
        single, _ = early_conformer.encode_exit(params, state, feats,
                                                lengths, cfg, n)
        np.testing.assert_allclose(np.asarray(full[n - 1]),
                                   np.asarray(single), atol=1e-4)


def test_train_mode_updates_bn_state():
    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    _, _, new_state = early_conformer.apply(params, state, feats, lengths,
                                            cfg, rng=jax.random.PRNGKey(3),
                                            train=True)
    before = np.asarray(state["blocks"]["conv_bn"]["mean"])
    after = np.asarray(new_state["blocks"]["conv_bn"]["mean"])
    assert not np.allclose(before, after)


def test_jit_compiles():
    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    fn = jax.jit(lambda p, s, f, l: early_conformer.apply(p, s, f, l, cfg))
    logp, _, _ = fn(params, state, feats, lengths)
    assert np.isfinite(np.asarray(logp)).all()


def test_logits_head_mode_matches_log_softmax():
    """apply(log_probs=False) returns raw logits whose log_softmax is the
    default output, and greedy decode over either is identical."""
    from early_exit_tpu.ops import ctc

    cfg = TINY
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats, lengths = _batch(cfg)
    logp, sub_len, _ = early_conformer.apply(params, state, feats,
                                             lengths, cfg)
    logits, sub_len2, _ = early_conformer.apply(params, state, feats,
                                                lengths, cfg,
                                                log_probs=False)
    np.testing.assert_array_equal(np.asarray(sub_len), np.asarray(sub_len2))
    np.testing.assert_allclose(
        np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)),
        np.asarray(logp), atol=1e-5)
    toks_a, n_a = ctc.greedy_decode(logp[-1], sub_len)
    toks_b, n_b = ctc.greedy_decode(logits[-1], sub_len)
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_b))
    np.testing.assert_array_equal(np.asarray(n_a), np.asarray(n_b))

"""Fused Conformer-block Pallas kernel vs the XLA block (interpret mode).

The kernel mirrors models/conformer.block_apply(train=False) op for op;
fp32 parity is tight, the bf16 inference profile agrees to bf16 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.models import conformer
from early_exit_tpu.ops.pallas import conformer_block as fcb


def _setup(compute="float32", residual="float32", softmax="float32",
           d=64, h=4, ff=128, k=7):
    cfg = conformer.ConformerConfig(
        d_model=d, n_heads=h, d_ff=ff, kernel_size=k, dropout=0.0,
        compute_dtype=compute, residual_dtype=residual,
        attn_softmax_dtype=softmax)
    params, state = conformer.block_init(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def _data(B=3, T=50, d=64, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32))
    lengths = jnp.asarray([T, T - 13, T // 4])
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    return x, lengths, mask


def test_fp32_parity():
    cfg, params, state = _setup()
    x, lengths, mask = _data()
    ref, _ = conformer.block_apply(params, state, x, mask, cfg,
                                   train=False)
    folded = fcb.fold_block_params(params, state, compute_dtype=cfg.dtype)
    got = fcb.fused_block_apply(
        folded, x, lengths, n_heads=cfg.n_heads,
        kernel_size=cfg.kernel_size, compute_dtype=cfg.dtype,
        residual_dtype=cfg.rdtype, attn_softmax_dtype=cfg.sm_dtype,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_bf16_inference_profile_parity():
    """The benched profile: bf16 matmuls, residual stream and softmax."""
    cfg, params, state = _setup(compute="bfloat16", residual="bfloat16",
                                softmax="bfloat16")
    x, lengths, mask = _data()
    ref, _ = conformer.block_apply(params, state, x, mask, cfg,
                                   train=False)
    folded = fcb.fold_block_params(params, state, compute_dtype=cfg.dtype)
    got = fcb.fused_block_apply(
        folded, x, lengths, n_heads=cfg.n_heads,
        kernel_size=cfg.kernel_size, compute_dtype=cfg.dtype,
        residual_dtype=cfg.rdtype, attn_softmax_dtype=cfg.sm_dtype,
        interpret=True)
    d = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    # outputs are LayerNormed (unit scale): bf16 has ~2^-8 ulps
    assert d.max() < 0.06 and d.mean() < 0.01, (d.max(), d.mean())


def test_stacked_fold_and_stack_apply():
    """fold_block_params works on lax.scan-stacked params and the fused
    stack matches the XLA stack (collect_outputs included)."""
    cfg, _, _ = _setup()
    params, state = conformer.stack_init(jax.random.PRNGKey(1), cfg, 3)
    x, lengths, mask = _data()
    ref, _, ref_outs = conformer.stack_apply(params, state, x, mask, cfg,
                                             train=False,
                                             collect_outputs=True)
    got, _, got_outs = fcb.fused_stack_apply(params, state, x, lengths,
                                             cfg, collect_outputs=True,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_outs), np.asarray(ref_outs),
                               atol=5e-5, rtol=1e-4)


def test_non_128_time_is_padded():
    cfg, params, state = _setup()
    x, lengths, mask = _data(T=37)
    ref, _ = conformer.block_apply(params, state, x, mask, cfg,
                                   train=False)
    folded = fcb.fold_block_params(params, state, compute_dtype=cfg.dtype)
    got = fcb.fused_block_apply(
        folded, x, lengths, n_heads=cfg.n_heads,
        kernel_size=cfg.kernel_size, compute_dtype=cfg.dtype,
        residual_dtype=cfg.rdtype, attn_softmax_dtype=cfg.sm_dtype,
        interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_model_level_dispatch():
    """ModelConfig(fused_block=True) routes early_conformer inference
    through the kernel and matches the XLA path."""
    from early_exit_tpu.configs import ModelConfig
    from early_exit_tpu.models import early_conformer

    base = dict(d_model=32, n_heads=4, d_feed_forward=64, n_enc_exits=2,
                n_enc_layers_per_exit=1, depthwise_kernel_size=7,
                vocab_size=16, n_mels=8, compute_dtype="float32",
                drop_prob=0.0)
    cfg_x = ModelConfig(**base)
    cfg_f = ModelConfig(**base, fused_block=True)
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg_x)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 67, 8).astype(np.float32))
    lengths = jnp.asarray([67, 40])
    lp_x, sl_x, _ = early_conformer.apply(params, state, feats, lengths,
                                          cfg_x, train=False)
    lp_f, sl_f, _ = early_conformer.apply(params, state, feats, lengths,
                                          cfg_f, train=False)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_x),
                               atol=1e-5, rtol=1e-5)
    assert jnp.array_equal(sl_x, sl_f)


def test_int8_fused_matches_xla_int8():
    """W8A8 kernel variant vs the XLA int8 block (quantize='int8'):
    same weight quantization (per-channel, from raw fp32) and same
    per-row activation quantization -> near-identical outputs; and both
    stay close to the unquantized fp32 block."""
    import dataclasses

    cfg, params, state = _setup()
    cfg8 = dataclasses.replace(cfg, quantize="int8")
    x, lengths, mask = _data()
    ref32, _ = conformer.block_apply(params, state, x, mask, cfg,
                                     train=False)
    ref8, _ = conformer.block_apply(params, state, x, mask, cfg8,
                                    train=False)
    folded = fcb.fold_block_params(params, state, compute_dtype=cfg.dtype,
                                   quantize="int8")
    assert len(folded) == len(fcb.PARAM_ORDER_INT8)
    got = fcb.fused_block_apply(
        folded, x, lengths, n_heads=cfg.n_heads,
        kernel_size=cfg.kernel_size, compute_dtype=cfg.dtype,
        residual_dtype=cfg.rdtype, attn_softmax_dtype=cfg.sm_dtype,
        interpret=True, quantize="int8")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref8),
                               atol=2e-4, rtol=1e-3)
    rel = (np.abs(np.asarray(got) - np.asarray(ref32)).max()
           / (np.abs(np.asarray(ref32)).max() + 1e-9))
    assert rel < 0.05, rel


def test_int8_fused_stack_apply():
    """cfg.quantize='int8' routes fused_stack_apply through the W8A8
    kernel and stays close to the XLA int8 stack."""
    import dataclasses

    cfg, _, _ = _setup()
    cfg8 = dataclasses.replace(cfg, quantize="int8")
    params, state = conformer.stack_init(jax.random.PRNGKey(1), cfg, 2)
    x, lengths, mask = _data()
    ref, _ = conformer.stack_apply(params, state, x, mask, cfg8,
                                   train=False)
    got, _ = fcb.fused_stack_apply(params, state, x, lengths, cfg8,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_collect_every_matches_full_collection():
    """collect_every=k emits exactly the outputs of layers k-1, 2k-1, …
    — identical values to slicing the full per-layer collection — in
    both the fused (grouped scan) and XLA (post-scan slice) paths."""
    cfg, _, _ = _setup()
    params, state = conformer.stack_init(jax.random.PRNGKey(2), cfg, 4)
    x, lengths, mask = _data(seed=3)

    ref, _, all_outs = conformer.stack_apply(params, state, x, mask, cfg,
                                             train=False,
                                             collect_outputs=True)
    want = np.asarray(all_outs)[1::2]          # layers 1, 3 (0-based)

    got_x, _, outs_x = conformer.stack_apply(params, state, x, mask, cfg,
                                             train=False,
                                             collect_outputs=True,
                                             collect_every=2)
    np.testing.assert_array_equal(np.asarray(outs_x), want)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(ref))

    got_f, _, outs_f = fcb.fused_stack_apply(params, state, x, lengths,
                                             cfg, collect_outputs=True,
                                             collect_every=2,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(outs_f), want,
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
    # the last collected output IS the final hidden state
    np.testing.assert_array_equal(np.asarray(outs_x[-1]), np.asarray(got_x))

"""W8A8 int8 dynamic-quantization tests (nn.core.linear(quantize="int8"),
ConformerConfig.quantize, ModelConfig.quantize).

The quantized path targets the v5e int8 MXU rate (2x bf16); these tests
pin its numerics on CPU: elementwise round-trip bounds, linear/MHA
closeness to fp32, greedy-decode parity on the committed trained
flagship checkpoint, and that training is never quantized.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.nn import core as nn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP = os.path.join(REPO, "assets", "flagship_ckpt")


def test_quantize_int8_roundtrip_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 64)) * 3.0
    q, scale = nn.quantize_int8(x, axis=-1)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * scale
    # symmetric rounding: per-element error <= scale/2 of that row
    err = jnp.abs(deq - x)
    assert bool(jnp.all(err <= scale * 0.5 + 1e-7))


def test_quantize_int8_zero_row_safe():
    x = jnp.zeros((4, 32))
    q, scale = nn.quantize_int8(x, axis=-1)
    assert bool(jnp.all(q == 0)) and bool(jnp.all(jnp.isfinite(scale)))


def test_linear_int8_close_to_fp32():
    kx, kp = jax.random.split(jax.random.PRNGKey(1))
    p = nn.linear_init(kp, 128, 96)
    x = jax.random.normal(kx, (4, 20, 128))
    y32 = nn.linear(p, x)
    y8 = nn.linear(p, x, quantize="int8")
    # relative error vs the output magnitude, well under bf16 resolution
    rel = float(jnp.max(jnp.abs(y8 - y32)) / (jnp.max(jnp.abs(y32)) + 1e-9))
    assert rel < 0.02, rel


def test_linear_int8_output_dtype_follows_compute_dtype():
    p = nn.linear_init(jax.random.PRNGKey(2), 32, 32)
    x = jnp.ones((2, 32))
    assert nn.linear(p, x, compute_dtype=jnp.bfloat16,
                     quantize="int8").dtype == jnp.bfloat16
    assert nn.linear(p, x, quantize="int8").dtype == jnp.float32


def test_mha_int8_close_to_fp32():
    kp, kx = jax.random.split(jax.random.PRNGKey(3))
    p = nn.mha_init(kp, 64)
    x = jax.random.normal(kx, (2, 12, 64))
    y32 = nn.mha(p, x, x, 4)
    y8 = nn.mha(p, x, x, 4, quantize="int8")
    rel = float(jnp.max(jnp.abs(y8 - y32)) / (jnp.max(jnp.abs(y32)) + 1e-9))
    assert rel < 0.05, rel


def test_conformer_block_quantize_inference_only():
    """quantize='int8' must be a no-op at train time (round has zero
    gradient — quantized training would silently stop learning)."""
    from early_exit_tpu.models import conformer

    cfg = conformer.ConformerConfig(d_model=32, n_heads=4, d_ff=64,
                                    kernel_size=7, quantize="int8")
    assert cfg._quant(train=True) is None
    assert cfg._quant(train=False) == "int8"

    params, state = conformer.block_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 32))
    mask = jnp.ones((2, 10), bool)

    def loss(p):
        y, _ = conformer.block_apply(p, state, x, mask, cfg,
                                     rng=jax.random.PRNGKey(2), train=True)
        return jnp.sum(jnp.square(y))

    g = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms)) and max(norms) > 0.0


def test_conformer_block_int8_close():
    from early_exit_tpu.models import conformer

    base = dict(d_model=64, n_heads=4, d_ff=128, kernel_size=7)
    cfg32 = conformer.ConformerConfig(**base)
    cfg8 = conformer.ConformerConfig(**base, quantize="int8")
    params, state = conformer.block_init(jax.random.PRNGKey(0), cfg32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64))
    mask = jnp.arange(16)[None] < jnp.asarray([16, 11])[:, None]
    y32, _ = conformer.block_apply(params, state, x, mask, cfg32)
    y8, _ = conformer.block_apply(params, state, x, mask, cfg8)
    rel = float(jnp.max(jnp.abs(y8 - y32)) / (jnp.max(jnp.abs(y32)) + 1e-9))
    assert rel < 0.05, rel


def test_gated_apply_int8_smoke():
    """The confidence-gated path honors ModelConfig.quantize (the
    lax.while_loop body runs the same quantized block code)."""
    import dataclasses

    from early_exit_tpu.configs import ModelConfig
    from early_exit_tpu.models import early_conformer, early_exit_gate

    cfg = ModelConfig(d_model=32, n_heads=4, d_feed_forward=64,
                      n_enc_exits=2, n_enc_layers_per_exit=1,
                      depthwise_kernel_size=7, vocab_size=16,
                      compute_dtype="float32")
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 40, cfg.n_mels))
    lengths = jnp.asarray([40, 28])
    for c in (cfg, dataclasses.replace(cfg, quantize="int8")):
        logp, chosen, sub_len, _ = early_exit_gate.gated_apply(
            params, state, feats, lengths, c, threshold=0.99)
        assert bool(jnp.all(jnp.isfinite(logp)))
        assert logp.shape[-1] == 16 and chosen.shape == (2,)


@pytest.mark.skipif(not os.path.exists(FLAGSHIP),
                    reason="committed flagship checkpoint absent")
def test_flagship_int8_greedy_decode_parity():
    """The decision-grade check: on the committed reference-dims trained
    checkpoint, int8 inference must greedy-decode to the SAME tokens as
    the benched bf16 profile on held-out audio from the trained
    distribution (the bench gated-leg corpus, seed 7777)."""
    import dataclasses

    from early_exit_tpu.configs import AudioConfig, ModelConfig
    from early_exit_tpu.data.librispeech import SyntheticDataset
    from early_exit_tpu.models import early_conformer
    from early_exit_tpu.ops import ctc, frontend
    from early_exit_tpu.training import checkpoint

    acfg = AudioConfig()
    cfg = ModelConfig(attn_softmax_dtype="bfloat16")
    params, state = early_conformer.init(jax.random.PRNGKey(0), cfg)
    params, state = checkpoint.load_model_file(FLAGSHIP, params, state)

    B = 4
    ds = SyntheticDataset(n_items=B, seed=7777, min_words=4, max_words=7)
    utts = [ds[i] for i in range(B)]
    max_n = max(len(u.waveform) for u in utts)
    wav = np.zeros((B, max_n), np.float32)
    counts = np.zeros((B,), np.int32)
    for i, u in enumerate(utts):
        wav[i, :len(u.waveform)] = u.waveform
        counts[i] = len(u.waveform)
    feats = frontend.mel_spectrogram(jnp.asarray(wav), acfg)
    lengths = frontend.mel_lengths(jnp.asarray(counts), acfg.hop_length)

    def decode(c):
        logp, sub_len, _ = early_conformer.apply(params, state, feats,
                                                 lengths, c, train=False)
        toks, ntoks = ctc.greedy_decode(logp[-1], sub_len)
        return np.asarray(toks), np.asarray(ntoks)

    t32, n32 = decode(cfg)
    t8, n8 = decode(dataclasses.replace(cfg, quantize="int8"))
    assert (n32 == n8).all()
    for i in range(B):
        assert (t32[i, :n32[i]] == t8[i, :n8[i]]).all(), i


def test_cli_quantize_flag_plumbs_into_model_config():
    from early_exit_tpu.cli import get_args

    _, mcfg, _, _, _ = get_args(
        ["--decoder_mode", "ctc", "--bpe", "false",
         "--quantize", "int8"], mode="infer")
    assert mcfg.quantize == "int8"
    _, mcfg, _, _, _ = get_args(
        ["--decoder_mode", "ctc", "--bpe", "false"], mode="infer")
    assert mcfg.quantize == "none"

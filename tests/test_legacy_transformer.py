import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import legacy_transformer as lt

TINY = ModelConfig(d_model=32, n_heads=4, d_feed_forward=64,
                   n_enc_exits=2, n_enc_layers_per_exit=2, n_dec_layers=2,
                   depthwise_kernel_size=7, vocab_size=24, n_mels=8,
                   compute_dtype="float32", drop_prob=0.0,
                   pad_id=20, bos_id=1, eos_id=2)


def _feats(cfg, B=2, T=61, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(B, T, cfg.n_mels).astype(np.float32))


def _t_sub(T):
    return ((T - 3) // 2 + 1 - 3) // 2 + 1


def test_ctc_self_attention():
    cfg = TINY
    params = lt.ctc_self_attention_init(jax.random.PRNGKey(0), cfg)
    out = lt.ctc_self_attention_apply(params, _feats(cfg), cfg)
    assert out.shape == (2, _t_sub(61), cfg.vocab_size)
    np.testing.assert_allclose(np.asarray(jnp.exp(out).sum(-1)), 1.0,
                               atol=1e-4)


def test_early_encoder():
    cfg = TINY
    params = lt.early_encoder_init(jax.random.PRNGKey(0), cfg)
    out = lt.early_encoder_apply(params, _feats(cfg), cfg)
    assert out.shape == (2, 2, _t_sub(61), cfg.vocab_size)
    # exits differ (deeper stack)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_early_transformer():
    cfg = TINY
    params = lt.early_transformer_init(jax.random.PRNGKey(0), cfg)
    trg = jnp.asarray([[1, 5, 6, 2], [1, 7, 2, 20]])
    dec, enc = lt.early_transformer_apply(params, _feats(cfg), trg, cfg)
    assert dec.shape == (2, 2, 4, cfg.vocab_size)
    assert enc.shape == (2, 2, _t_sub(61), cfg.vocab_size)
    # both outputs are log-probs in the legacy model (early_exit.py:474,478)
    np.testing.assert_allclose(np.asarray(jnp.exp(dec).sum(-1)), 1.0,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.exp(enc).sum(-1)), 1.0,
                               atol=1e-4)


def test_legacy_transformer_full():
    cfg = TINY
    params = lt.legacy_transformer_init(jax.random.PRNGKey(0), cfg)
    feats = _feats(cfg)
    # pad-free targets: the reference's forward() pad-masks the decoder
    # self-attention but _decoder_() applies only the causal mask
    # (transformer.py:92 vs 109), so the two agree only without padding
    trg = jnp.asarray([[1, 5, 6, 2], [1, 7, 2, 3]])
    dec, enc_ctc = lt.legacy_transformer_apply(params, feats, trg, cfg)
    assert dec.shape == (2, 4, cfg.vocab_size)
    assert enc_ctc.shape == (2, _t_sub(61), cfg.vocab_size)

    # ctc_encoder equals the CTC head of forward's encoder branch
    direct = lt.legacy_transformer_ctc_encoder(params, feats, cfg)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(enc_ctc),
                               atol=1e-4)

    # _encoder_ + _decoder_ composition matches forward's decoder output
    enc = lt.legacy_transformer_encode(params, feats, cfg)
    dec2 = lt.legacy_transformer_decode(params, trg, enc, cfg)
    np.testing.assert_allclose(np.asarray(dec2), np.asarray(dec),
                               atol=1e-4)


def test_causality_of_decoder():
    """Changing future target tokens must not affect earlier positions."""
    cfg = TINY
    params = lt.legacy_transformer_init(jax.random.PRNGKey(1), cfg)
    feats = _feats(cfg, seed=1)
    enc = lt.legacy_transformer_encode(params, feats, cfg)
    trg_a = jnp.asarray([[1, 5, 6, 7]])
    trg_b = jnp.asarray([[1, 5, 9, 9]])
    da = lt.legacy_transformer_decode(params, trg_a, enc[:1], cfg)
    db = lt.legacy_transformer_decode(params, trg_b, enc[:1], cfg)
    np.testing.assert_allclose(np.asarray(da[:, :2]),
                               np.asarray(db[:, :2]), atol=1e-5)

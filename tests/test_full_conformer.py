import jax
import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.configs import ModelConfig, TrainConfig
from early_exit_tpu.models import full_conformer, transformer_decoder
from early_exit_tpu.nn import core as nn
from early_exit_tpu.ops import ctc
from early_exit_tpu.optim import make_optimizer
from early_exit_tpu.training import trainer

TINY = ModelConfig(model_type="full_conformer", d_model=32, n_heads=4,
                   d_feed_forward=64, n_enc_exits=2,
                   n_enc_layers_per_exit=1, n_dec_layers=2,
                   depthwise_kernel_size=7, vocab_size=24, n_mels=8,
                   compute_dtype="float32", drop_prob=0.0,
                   pad_id=20, bos_id=1, eos_id=2)


def _batch(cfg, B=2, T=61, L=7, seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, T, cfg.n_mels).astype(np.float32))
    labels = np.full((B, L), cfg.pad_id, np.int32)
    labels[:, 0] = cfg.bos_id
    for b in range(B):
        n = L - 2 - b
        labels[b, 1:1 + n] = rng.randint(3, 19, size=n)
        labels[b, 1 + n] = cfg.eos_id
    return {"feats": feats, "feat_lengths": jnp.asarray([T, T - 20]),
            "labels": jnp.asarray(labels),
            "label_lengths": jnp.asarray([L - b for b in range(B)])}


def test_forward_shapes():
    cfg = TINY
    params, state = full_conformer.init(jax.random.PRNGKey(0), cfg)
    b = _batch(cfg)
    trg = b["labels"][:, :-1]
    dec, enc, sub_len, _ = full_conformer.apply(
        params, state, b["feats"], b["feat_lengths"], trg, cfg)
    t_sub = ((61 - 3) // 2 + 1 - 3) // 2 + 1
    assert dec.shape == (2, 2, trg.shape[1], cfg.vocab_size)
    assert enc.shape == (2, 2, t_sub, cfg.vocab_size)
    # enc rows are log-probs; dec rows are raw logits
    np.testing.assert_allclose(np.asarray(jnp.exp(enc).sum(-1)), 1.0,
                               atol=1e-4)


def test_decode_exit_matches_full_forward():
    """_decoder_ parity: decode_exit(n) log-probs == log_softmax of the
    n-th exit of apply()'s dec output when memory comes from encode_exit."""
    cfg = TINY
    params, state = full_conformer.init(jax.random.PRNGKey(1), cfg)
    b = _batch(cfg, seed=1)
    trg = b["labels"][:, :-1]
    dec, _, _, _ = full_conformer.apply(params, state, b["feats"],
                                        b["feat_lengths"], trg, cfg)
    for n in (1, 2):
        mem, _ = full_conformer.encode_exit(params, state, b["feats"],
                                            b["feat_lengths"], cfg, n)
        lp = full_conformer.decode_exit(params, trg, mem, cfg, n)
        expect = jax.nn.log_softmax(dec[n - 1], axis=-1)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(expect),
                                   atol=1e-4)


def test_kv_cache_step_matches_full_decoder():
    """Incremental decoding with KV cache must equal the full stacked
    decoder on an unpadded prefix."""
    cfg = TINY
    key = jax.random.PRNGKey(2)
    dec_params = transformer_decoder.stack_init(key, cfg.d_model,
                                                cfg.d_feed_forward, 3)
    final_ln = nn.layer_norm_init(cfg.d_model)
    rng = np.random.RandomState(3)
    B, L, T = 2, 5, 9
    x = jnp.asarray(rng.randn(B, L, cfg.d_model).astype(np.float32))
    mem = jnp.asarray(rng.randn(B, T, cfg.d_model).astype(np.float32))

    full = transformer_decoder.stack_apply(dec_params, x, mem, cfg.n_heads,
                                           final_ln)
    cache = transformer_decoder.init_cache(dec_params, B, L, cfg.d_model)
    steps = []
    for t in range(L):
        y, cache = transformer_decoder.step_apply(
            dec_params, x[:, t:t + 1], mem, cfg.n_heads, final_ln, cache)
        steps.append(y)
    inc = jnp.concatenate(steps, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=1e-4)


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(4)
    logits = rng.randn(3, 8, 10).astype(np.float32)
    targets = rng.randint(0, 10, size=(3, 8))
    ours = ctc.cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
    ref = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits).permute(0, 2, 1), torch.tensor(targets))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


@pytest.mark.slow
def test_aed_training_decreases_loss():
    cfg = TINY
    tcfg = TrainConfig(decoder_mode="aed")
    opt = make_optimizer(cfg.d_model, warmup=10)
    state = trainer.create_train_state(jax.random.PRNGKey(0),
                                       full_conformer, cfg, opt)
    step = jax.jit(trainer.make_train_step(full_conformer, cfg, tcfg, opt))
    b = _batch(cfg)
    losses = []
    rng = jax.random.PRNGKey(5)
    for _ in range(20):
        state, m = step(state, b, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])

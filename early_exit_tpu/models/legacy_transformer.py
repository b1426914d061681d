"""Legacy vanilla-Transformer model family.

Capability parity with the reference's hand-rolled (pre-Conformer) models,
none of which are reachable from its CLIs but all of which are part of the
model zoo (SURVEY.md §2):

- `EarlyEncoder`  ~ Early_encoder (early_exit.py:497-562): conv subsample
  → PE → n_exits vanilla pre-norm encoder stacks, per-exit CTC head.
- `EarlyTransformer` ~ Early_transformer (early_exit.py:367-494): the same
  trunk plus a per-exit transformer decoder (shared token embedding + PE),
  returning per-exit decoder log-probs AND per-exit CTC log-probs.
- `LegacyTransformer` ~ Transformer (models/model/transformer.py:29-159):
  single encoder/decoder AED with a CTC head (`ctc_encoder`) — the model
  `BeamInference.beam_predict` drives (beam_infer.py:85-90).
- `CTCSelfAttention` ~ CTC_Self_Attention (transformer.py:165-200).

The vanilla encoder layer matches models/blocks/encoder_layer.py:14-44:
pre-norm MHA → dropout → residual, pre-norm ReLU-FFN → dropout → residual,
with a final LayerNorm on top of each stack (models/model/encoder.py:33).
The reference runs these models with NO encoder padding mask
(src_pad_mask=None, early_exit.py:461, 550) — preserved here.

Known reference quirk NOT preserved: the legacy attention masks with
-1e-9 instead of -1e9 (models/layers/scale_dot_product_attention.py:35),
i.e. masking is a no-op; we mask correctly wherever a mask is supplied.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import subsampling, transformer_decoder
from early_exit_tpu.nn import core as nn


# ------------------------------------------------------------ encoder ----

def _enc_layer_init(key, d_model, d_ff):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln1": nn.layer_norm_init(d_model),
        "attn": nn.mha_init(k1, d_model),
        "ln2": nn.layer_norm_init(d_model),
        "w1": nn.linear_init(k2, d_model, d_ff),
        "w2": nn.linear_init(k3, d_ff, d_model),
    }


def _enc_layer_apply(p, x, cfg: ModelConfig, *, mask=None, rng=None,
                     train=False):
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    y = nn.layer_norm(p["ln1"], x)
    y = nn.mha(p["attn"], y, y, cfg.n_heads, key_mask=mask,
               compute_dtype=cfg.dtype)
    if train:
        y = nn.dropout(y, cfg.drop_prob, r1, train=True)
    x = x + y
    y = nn.layer_norm(p["ln2"], x)
    y = jax.nn.relu(nn.linear(p["w1"], y, compute_dtype=cfg.dtype))
    if train:
        y = nn.dropout(y, cfg.drop_prob, r2, train=True)
    y = nn.linear(p["w2"], y, compute_dtype=cfg.dtype)
    if train:
        y = nn.dropout(y, cfg.drop_prob, r3, train=True)
    return x + y


def _enc_stack_init(key, cfg: ModelConfig, n_layers):
    keys = jax.random.split(key, n_layers)
    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[_enc_layer_init(k, cfg.d_model, cfg.d_feed_forward)
          for k in keys])
    return {"layers": layers, "final_ln": nn.layer_norm_init(cfg.d_model)}


def _enc_stack_apply(p, x, cfg: ModelConfig, *, mask=None, rng=None,
                     train=False):
    n_layers = jax.tree_util.tree_leaves(p["layers"])[0].shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, n_layers)

    def body(h, xs):
        lp, r = xs
        return _enc_layer_apply(lp, h, cfg, mask=mask, rng=r,
                                train=train), None

    x, _ = lax.scan(body, x, (p["layers"], rngs))
    return nn.layer_norm(p["final_ln"], x)


def _frontend(params, feats, cfg: ModelConfig, rng, train):
    x = subsampling.conv_subsample_apply(params["subsample"], feats,
                                         compute_dtype=cfg.dtype)
    x = x.astype(jnp.float32) + nn.sinusoidal_pe(x.shape[1],
                                                 cfg.d_model)[None]
    if train and rng is not None:
        x = nn.dropout(x, cfg.drop_prob, rng, train=True)
    return x


# ------------------------------------------------------- CTCSelfAttention --

def ctc_self_attention_init(key, cfg: ModelConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "subsample": subsampling.conv_subsample_init(k1, cfg.n_mels,
                                                     cfg.d_model),
        "encoder": _enc_stack_init(k2, cfg, cfg.n_enc_layers_per_exit),
        "head": nn.linear_init(k3, cfg.d_model, cfg.vocab_size),
    }


def ctc_self_attention_apply(params, feats, cfg: ModelConfig, *,
                             rng=None, train=False):
    """(B, T, n_mels) -> (B, T', V) log-probs (transformer.py:186-200)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    x = _frontend(params, feats, cfg, r1, train)
    x = _enc_stack_apply(params["encoder"], x, cfg, rng=r2, train=train)
    logits = nn.linear(params["head"], x, compute_dtype=cfg.dtype)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


# ------------------------------------------------------------ EarlyEncoder --

def early_encoder_init(key, cfg: ModelConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    enc_keys = jax.random.split(k2, cfg.n_enc_exits)
    head_keys = jax.random.split(k3, cfg.n_enc_exits)
    return {
        "subsample": subsampling.conv_subsample_init(k1, cfg.n_mels,
                                                     cfg.d_model),
        "encoders": [
            _enc_stack_init(k, cfg, cfg.n_enc_layers_per_exit)
            for k in enc_keys],
        "heads": [nn.linear_init(k, cfg.d_model, cfg.vocab_size)
                  for k in head_keys],
    }


def early_encoder_apply(params, feats, cfg: ModelConfig, *, rng=None,
                        train=False):
    """-> (n_exits, B, T', V) log-probs (early_exit.py:545-562)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, cfg.n_enc_exits + 1)
    x = _frontend(params, feats, cfg, rngs[0], train)
    outs = []
    for e in range(cfg.n_enc_exits):
        x = _enc_stack_apply(params["encoders"][e], x, cfg,
                             rng=rngs[e + 1], train=train)
        logits = nn.linear(params["heads"][e], x, compute_dtype=cfg.dtype)
        outs.append(jax.nn.log_softmax(logits.astype(jnp.float32),
                                       axis=-1))
    return jnp.stack(outs)


# -------------------------------------------------------- EarlyTransformer --

def early_transformer_init(key, cfg: ModelConfig):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    enc_keys = jax.random.split(k2, cfg.n_enc_exits)
    h1_keys = jax.random.split(k3, cfg.n_enc_exits)
    h2_keys = jax.random.split(k4, cfg.n_enc_exits)
    dec_keys = jax.random.split(k5, cfg.n_enc_exits)
    return {
        "subsample": subsampling.conv_subsample_init(k1, cfg.n_mels,
                                                     cfg.d_model),
        "encoders": [
            _enc_stack_init(k, cfg, cfg.n_enc_layers_per_exit)
            for k in enc_keys],
        "ctc_heads": [nn.linear_init(k, cfg.d_model, cfg.vocab_size)
                      for k in h1_keys],
        "out_heads": [nn.linear_init(k, cfg.d_model, cfg.vocab_size)
                      for k in h2_keys],
        "decoders": [
            transformer_decoder.stack_init(k, cfg.d_model,
                                           cfg.d_feed_forward,
                                           cfg.n_dec_layers)
            for k in dec_keys],
        "emb": nn.embedding_init(k6, cfg.vocab_size, cfg.d_model),
        "final_ln": nn.layer_norm_init(cfg.d_model),   # shared, parity
    }


def early_transformer_apply(params, feats, trg, cfg: ModelConfig, *,
                            rng=None, train=False):
    """-> (dec_logp (E, B, L, V), enc_logp (E, B, T', V))
    (early_exit.py:449-483; both outputs ARE log-softmaxed there)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, 2 * cfg.n_enc_exits + 2)
    x = _frontend(params, feats, cfg, rngs[0], train)
    trg_emb = nn.embedding_lookup(params["emb"], trg)
    trg_emb = trg_emb + nn.sinusoidal_pe(trg.shape[1], cfg.d_model)[None]
    if train:
        trg_emb = nn.dropout(trg_emb, cfg.drop_prob, rngs[1], train=True)
    tgt_valid = trg != cfg.pad_id

    dec_out, enc_out = [], []
    for e in range(cfg.n_enc_exits):
        x = _enc_stack_apply(params["encoders"][e], x, cfg,
                             rng=rngs[2 + 2 * e], train=train)
        h = transformer_decoder.stack_apply(
            params["decoders"][e], trg_emb, x, cfg.n_heads,
            params["final_ln"], tgt_pad_mask=tgt_valid,
            dropout_rate=cfg.drop_prob, rng=rngs[3 + 2 * e], train=train,
            compute_dtype=cfg.dtype)
        d_logits = nn.linear(params["out_heads"][e], h,
                             compute_dtype=cfg.dtype)
        dec_out.append(jax.nn.log_softmax(d_logits.astype(jnp.float32),
                                          axis=-1))
        e_logits = nn.linear(params["ctc_heads"][e], x,
                             compute_dtype=cfg.dtype)
        enc_out.append(jax.nn.log_softmax(e_logits.astype(jnp.float32),
                                          axis=-1))
    return jnp.stack(dec_out), jnp.stack(enc_out)


# ------------------------------------------------------- LegacyTransformer --

def legacy_transformer_init(key, cfg: ModelConfig):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    return {
        "subsample": subsampling.conv_subsample_init(k1, cfg.n_mels,
                                                     cfg.d_model),
        "encoder": _enc_stack_init(k2, cfg, cfg.n_enc_layers_per_exit),
        "decoder": transformer_decoder.stack_init(
            k3, cfg.d_model, cfg.d_feed_forward, cfg.n_dec_layers),
        "ctc_head": nn.linear_init(k4, cfg.d_model, cfg.vocab_size),
        "out_head": nn.linear_init(k5, cfg.d_model, cfg.vocab_size),
        "emb": nn.embedding_init(k6, cfg.vocab_size, cfg.d_model),
        "final_ln": nn.layer_norm_init(cfg.d_model),
    }


def legacy_transformer_encode(params, feats, cfg: ModelConfig):
    """`_encoder_` parity (transformer.py:66-71)."""
    x = _frontend(params, feats, cfg, None, False)
    return _enc_stack_apply(params["encoder"], x, cfg)


def legacy_transformer_ctc_encoder(params, feats, cfg: ModelConfig):
    """`ctc_encoder` parity (transformer.py:73-80) — drives
    BeamInference.beam_predict (beam_infer.py:85-90)."""
    enc = legacy_transformer_encode(params, feats, cfg)
    logits = nn.linear(params["ctc_head"], enc, compute_dtype=cfg.dtype)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def legacy_transformer_decode(params, trg, enc, cfg: ModelConfig):
    """`_decoder_` parity (transformer.py:82-95)."""
    trg_emb = nn.embedding_lookup(params["emb"], trg)
    trg_emb = trg_emb + nn.sinusoidal_pe(trg.shape[1], cfg.d_model)[None]
    h = transformer_decoder.stack_apply(
        params["decoder"], trg_emb, enc, cfg.n_heads, params["final_ln"],
        compute_dtype=cfg.dtype)
    logits = nn.linear(params["out_head"], h, compute_dtype=cfg.dtype)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def legacy_transformer_apply(params, feats, trg, cfg: ModelConfig, *,
                             rng=None, train=False):
    """forward parity (transformer.py:97-125):
    -> (dec_logp (B, L, V), enc_ctc_logp (B, T', V))."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    x = _frontend(params, feats, cfg, r1, train)
    enc = _enc_stack_apply(params["encoder"], x, cfg, rng=r2, train=train)
    trg_emb = nn.embedding_lookup(params["emb"], trg)
    trg_emb = trg_emb + nn.sinusoidal_pe(trg.shape[1], cfg.d_model)[None]
    if train:
        trg_emb = nn.dropout(trg_emb, cfg.drop_prob, r3, train=True)
    tgt_valid = trg != cfg.pad_id
    h = transformer_decoder.stack_apply(
        params["decoder"], trg_emb, enc, cfg.n_heads, params["final_ln"],
        tgt_pad_mask=tgt_valid, dropout_rate=cfg.drop_prob, rng=rng,
        train=train, compute_dtype=cfg.dtype)
    d_logits = nn.linear(params["out_head"], h, compute_dtype=cfg.dtype)
    e_logits = nn.linear(params["ctc_head"], enc, compute_dtype=cfg.dtype)
    return (jax.nn.log_softmax(d_logits.astype(jnp.float32), axis=-1),
            jax.nn.log_softmax(e_logits.astype(jnp.float32), axis=-1))

"""full_conformer: AED model — shared Conformer trunk + per-exit CTC head
AND per-exit attention decoder.

Capability parity with ``full_conformer`` (models/model/early_exit.py:637-811):

- trunk identical to Early_conformer (conv subsample ×2 → PE → E stacks)
- per exit e: CTC head Linear(d,V)+log_softmax (`linears_1`) and a
  `n_dec_layers`-layer pre-norm Transformer decoder with its own output
  Linear(d,V) (`linears_2`); token embedding + target PE and the decoder
  final LayerNorm are SHARED across exits (early_exit.py:666-667)
- forward(src, lengths, trg) -> (dec_out (E,B,L,V) RAW logits —
  the reference comments out the log_softmax (early_exit.py:790) because
  training uses CrossEntropyLoss — and enc_out (E,B,T',V) log-probs)
- `_encoder_(src, lengths, n)` runs the trunk to exit n (1-based);
  `_decoder_(trg, enc, n)` runs decoder n + log_softmax
  (early_exit.py:719-762) — here `encode_exit` / `decode_exit`.

TPU-native: decoder layers are param-stacked per exit as (E, n_dec_layers,
…); training decodes ALL exits in one vmap over the exit axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import conformer, subsampling, transformer_decoder
from early_exit_tpu.models.early_conformer import (_conformer_cfg,
                                                   apply_heads,
                                                   frontend_embed)
from early_exit_tpu.nn import core as nn


def init(key: jax.Array, cfg: ModelConfig):
    (k_sub, k_blocks, k_ctc, k_dec, k_out, k_emb) = jax.random.split(key, 6)
    ccfg = _conformer_cfg(cfg)
    n_layers = cfg.n_enc_exits * cfg.n_enc_layers_per_exit
    block_params, block_state = conformer.stack_init(k_blocks, ccfg, n_layers)

    E = cfg.n_enc_exits
    ctc_keys = jax.random.split(k_ctc, E)
    ctc_heads = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[nn.linear_init(k, cfg.d_model, cfg.vocab_size) for k in ctc_keys])
    dec_keys = jax.random.split(k_dec, E)
    decoders = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[transformer_decoder.stack_init(k, cfg.d_model, cfg.d_feed_forward,
                                         cfg.n_dec_layers)
          for k in dec_keys])
    out_keys = jax.random.split(k_out, E)
    out_linears = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[nn.linear_init(k, cfg.d_model, cfg.vocab_size) for k in out_keys])

    params = {
        "subsample": subsampling.conv_subsample_init(k_sub, cfg.n_mels,
                                                     cfg.d_model),
        "blocks": block_params,
        "heads": ctc_heads,            # linears_1 (CTC)
        "emb": nn.embedding_init(k_emb, cfg.vocab_size, cfg.d_model),
        "decoders": decoders,          # leaves (E, n_dec_layers, ...)
        "out_linear": out_linears,     # linears_2
        "final_ln": nn.layer_norm_init(cfg.d_model),   # shared
    }
    state = {"blocks": block_state}
    return params, state


def _embed_targets(params, trg, cfg: ModelConfig, rng, train):
    """Token embedding + sinusoidal PE + dropout (early_exit.py:745-746)."""
    x = nn.embedding_lookup(params["emb"], trg)
    x = x + nn.sinusoidal_pe(trg.shape[1], cfg.d_model)[None]
    if train and rng is not None:
        x = nn.dropout(x, cfg.drop_prob, rng, train=True)
    return x


def encode(params, state, feats, lengths, cfg: ModelConfig, *,
           rng=None, train=False):
    """Trunk forward: returns (exit_hidden (E,B,T',D), sub_len, mask,
    new_state)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_pe, r_blocks = jax.random.split(rng)
    x, sub_len, mask = frontend_embed(params, feats, lengths, cfg,
                                      rng=r_pe, train=train)
    ccfg = _conformer_cfg(cfg)
    _, new_block_state, layer_outs = conformer.stack_apply(
        params["blocks"], state["blocks"], x, mask, ccfg,
        rng=r_blocks, train=train, collect_outputs=True)
    exit_idx = jnp.arange(1, cfg.n_enc_exits + 1) * cfg.n_enc_layers_per_exit - 1
    exit_hidden = jnp.take(layer_outs, exit_idx, axis=0)
    return exit_hidden, sub_len, mask, {"blocks": new_block_state}


def apply(params, state, feats, lengths, trg, cfg: ModelConfig, *,
          rng: Optional[jax.Array] = None, train: bool = False):
    """Training forward. trg: (B, L) decoder input (targets cut of last
    token, train.py:30-31).

    Returns (dec_logits (E,B,L,V) raw, enc_log_probs (E,B,T',V), sub_len,
    new_state)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_enc, r_emb, r_dec = jax.random.split(rng, 3)
    exit_hidden, sub_len, mask, new_state = encode(
        params, state, feats, lengths, cfg, rng=r_enc, train=train)

    enc_log_probs = apply_heads(params["heads"], exit_hidden, cfg)

    trg_emb = _embed_targets(params, trg, cfg, r_emb, train)
    tgt_valid = trg != cfg.pad_id      # create_pad_mask parity (True=valid)

    def decode_one(dec_params, out_lin, memory, r):
        h = transformer_decoder.stack_apply(
            dec_params, trg_emb, memory, cfg.n_heads, params["final_ln"],
            tgt_pad_mask=tgt_valid, memory_mask=None,
            dropout_rate=cfg.drop_prob, rng=r, train=train,
            compute_dtype=cfg.dtype)
        return nn.linear(out_lin, h, compute_dtype=cfg.dtype)

    dec_rngs = jax.random.split(r_dec, cfg.n_enc_exits)
    dec_logits = jax.vmap(decode_one)(params["decoders"],
                                      params["out_linear"], exit_hidden,
                                      dec_rngs)
    return dec_logits, enc_log_probs, sub_len, new_state


def encode_exit(params, state, feats, lengths, cfg: ModelConfig,
                n_exit: int):
    """`_encoder_` parity: trunk up to exit n (1-based) -> hidden (B,T',D)."""
    sl = slice(0, n_exit * cfg.n_enc_layers_per_exit)
    sub_params = jax.tree_util.tree_map(lambda a: a[sl], params["blocks"])
    sub_state = jax.tree_util.tree_map(lambda a: a[sl], state["blocks"])
    x, sub_len, mask = frontend_embed(params, feats, lengths, cfg,
                                      rng=None, train=False)
    h, _ = conformer.stack_apply(sub_params, sub_state, x, mask,
                                 _conformer_cfg(cfg), train=False)
    return h, sub_len


def decode_exit(params, trg, memory, cfg: ModelConfig, n_exit: int):
    """`_decoder_` parity: run decoder n (1-based) over full trg and
    return log-probs (B, L, V) (early_exit.py:739-762)."""
    e = n_exit - 1
    dec_params = jax.tree_util.tree_map(lambda a: a[e], params["decoders"])
    out_lin = jax.tree_util.tree_map(lambda a: a[e], params["out_linear"])
    trg_emb = _embed_targets(params, trg, cfg, None, False)
    tgt_valid = trg != cfg.pad_id
    h = transformer_decoder.stack_apply(
        dec_params, trg_emb, memory, cfg.n_heads, params["final_ln"],
        tgt_pad_mask=tgt_valid, compute_dtype=cfg.dtype)
    logits = nn.linear(out_lin, h, compute_dtype=cfg.dtype)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

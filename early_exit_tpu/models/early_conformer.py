"""Early-exit Conformer CTC encoder (the primary model).

Capability parity with ``Early_conformer`` (models/model/early_exit.py:565-634):
conv subsample ×2 (→ ~T/4) → sinusoidal PE + dropout → n_exits Conformer
stacks of n_layers each, with a per-exit Linear(d, V) + log_softmax head;
returns per-exit log-probs stacked as (n_exits, B, T', V).

TPU-native design: all `n_exits * n_layers` blocks share one stacked
parameter pytree and run under a single `lax.scan`; exit hidden states are
gathered from the scan outputs and the per-exit heads are applied with
`vmap` over stacked head weights — one compiled block body, MXU-shaped
matmuls, static shapes throughout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import conformer, subsampling
from early_exit_tpu.nn import core as nn


def _conformer_cfg(cfg: ModelConfig) -> conformer.ConformerConfig:
    return conformer.ConformerConfig(
        d_model=cfg.d_model, n_heads=cfg.n_heads, d_ff=cfg.d_feed_forward,
        kernel_size=cfg.depthwise_kernel_size, dropout=cfg.drop_prob,
        conv_norm=cfg.conv_norm, compute_dtype=cfg.compute_dtype,
        attention_impl=cfg.attention_impl, remat=cfg.remat,
        residual_dtype=(cfg.residual_dtype or cfg.compute_dtype),
        attn_softmax_dtype=cfg.attn_softmax_dtype,
        fused_block=cfg.fused_block, quantize=cfg.quantize)


def init(key: jax.Array, cfg: ModelConfig):
    """Returns (params, state)."""
    k_sub, k_blocks, k_heads = jax.random.split(key, 3)
    n_layers = cfg.n_enc_exits * cfg.n_enc_layers_per_exit
    block_params, block_state = conformer.stack_init(
        k_blocks, _conformer_cfg(cfg), n_layers)
    head_keys = jax.random.split(k_heads, cfg.n_enc_exits)
    heads = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[nn.linear_init(k, cfg.d_model, cfg.vocab_size) for k in head_keys])
    params = {
        "subsample": subsampling.conv_subsample_init(k_sub, cfg.n_mels,
                                                     cfg.d_model),
        "blocks": block_params,
        "heads": heads,   # leaves have leading axis n_enc_exits
    }
    state = {"blocks": block_state}
    return params, state


def frontend_embed(params, feats, lengths, cfg: ModelConfig, *,
                   rng: Optional[jax.Array], train: bool):
    """Subsample + positional encoding + dropout; returns (x, sub_len, mask)."""
    x = subsampling.conv_subsample_apply(params["subsample"], feats,
                                         compute_dtype=cfg.dtype)
    t_sub = x.shape[1]
    pe = nn.sinusoidal_pe(t_sub, cfg.d_model)
    x = x.astype(jnp.float32) + pe[None]
    if train and rng is not None:
        x = nn.dropout(x, cfg.drop_prob, rng, train=True)
    if cfg.length_mode == "reference":
        sub_len = subsampling.reference_subsampled_length(lengths, 4, t_sub)
    else:
        sub_len = jnp.minimum(subsampling.subsampled_length(lengths, 2), t_sub)
    mask = jnp.arange(t_sub)[None, :] < sub_len[:, None]
    x = jnp.where(mask[..., None], x, 0.0).astype(cfg.rdtype)
    return x, sub_len, mask


def apply_heads(heads, hidden, cfg: ModelConfig, *,
                log_probs: bool = True):
    """(E, B, T, D) exit hidden states -> (E, B, T, V) log-probs.

    log_probs=False returns raw bf16 logits instead: per-frame argmax
    (greedy CTC) is softmax-invariant, and skipping the fp32
    log_softmax materialization saves ~1.6 ms at B=128 (the normalized
    (E, B, T, V) fp32 tensor is ~200 MB of HBM writes). Beam decoders
    and the confidence gate need the normalized values — keep the
    default for those paths."""
    def one(head_p, h):
        logits = nn.linear(head_p, h, compute_dtype=cfg.dtype)
        if not log_probs:
            return logits
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jax.vmap(one)(heads, hidden)


def apply_hidden(params, state, feats, lengths, cfg: ModelConfig):
    """Inference trunk only: (B, T, mels) -> per-exit hidden states
    (E, B, T', D) + sub_lengths, heads NOT applied. Callers that need
    only the per-frame greedy argmax compose this with the fused
    head+argmax kernel (ops/pallas/head_argmax.py) to skip the
    (E, B, T', V) logits materialization entirely."""
    x, sub_len, mask = frontend_embed(params, feats, lengths, cfg,
                                      rng=None, train=False)
    ccfg = _conformer_cfg(cfg)
    # collect_every: the scan emits exactly the E exit-layer hiddens —
    # stacking all L layers and take()-ing E back costs an extra
    # (L, B, T, D) write plus (L+E, B, T, D) read/write of HBM traffic
    _, _, exit_outs = conformer.stack_apply(
        params["blocks"], state["blocks"], x, mask, ccfg,
        rng=None, train=False, collect_outputs=True,
        collect_every=cfg.n_enc_layers_per_exit)
    return exit_outs, sub_len


def apply(params, state, feats, lengths, cfg: ModelConfig, *,
          rng: Optional[jax.Array] = None, train: bool = False,
          attn_mask: Optional[jax.Array] = None,
          log_probs: bool = True):
    """feats: (B, T, n_mels) log-mel; lengths: (B,) original frame counts.

    attn_mask: optional (T', T') bool pair mask over subsampled frames
    (dynamic-chunk streaming training, training/trainer.py).

    log_probs=False returns raw head logits (see apply_heads) — exact
    for greedy decode, cheaper at large batch.

    Returns (log_probs (n_exits, B, T', V), sub_lengths (B,), new_state).
    Matches the forward contract of early_exit.py:617-634 plus explicit
    per-item subsampled lengths (the reference derives them at the caller).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_pe, r_blocks = jax.random.split(rng)
    x, sub_len, mask = frontend_embed(params, feats, lengths, cfg,
                                      rng=r_pe, train=train)

    ccfg = _conformer_cfg(cfg)
    # exit i reads the output of layer (i+1)*n_layers_per_exit - 1;
    # collect_every makes the scan emit exactly those E hiddens instead
    # of stacking all L layers and take()-ing E back out (saves an
    # (L, B, T, D) write + (L+E, B, T, D) read/write of HBM traffic)
    _, new_block_state, exit_hidden = conformer.stack_apply(
        params["blocks"], state["blocks"], x, mask, ccfg,
        rng=r_blocks, train=train, collect_outputs=True,
        collect_every=cfg.n_enc_layers_per_exit,
        attn_mask=attn_mask)                               # (E, B, T', D)

    out = apply_heads(params["heads"], exit_hidden, cfg,
                      log_probs=log_probs)
    return out, sub_len, {"blocks": new_block_state}


def encode_exit(params, state, feats, lengths, cfg: ModelConfig, n_exit: int):
    """Run the trunk only up to exit `n_exit` (1-based) and return that
    exit's log-probs — the efficient analogue of re-running `_encoder_`
    per exit (inference.py:44-48 re-runs the trunk from scratch per exit;
    here the caller can simply slice `apply`'s output, but this entry point
    exists for single-exit deployment where later layers must not run)."""
    sl = slice(0, n_exit * cfg.n_enc_layers_per_exit)
    sub_params = jax.tree_util.tree_map(lambda a: a[sl], params["blocks"])
    sub_state = jax.tree_util.tree_map(lambda a: a[sl], state["blocks"])
    x, sub_len, mask = frontend_embed(params, feats, lengths, cfg,
                                      rng=None, train=False)
    ccfg = _conformer_cfg(cfg)
    h, _ = conformer.stack_apply(sub_params, sub_state, x, mask, ccfg,
                                 train=False)
    head = jax.tree_util.tree_map(lambda a: a[n_exit - 1], params["heads"])
    logits = nn.linear(head, h, compute_dtype=cfg.dtype)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), sub_len

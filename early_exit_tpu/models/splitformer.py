"""Splitformer: early-exit Conformer with parallel downsampled branches.

Capability parity with ``Splitformer`` (models/model/early_exit.py:227-364):
identical to Early_conformer except that at the FIRST and LAST exits a
parallel branch runs alongside the exit's Conformer stack:

    branch_in = hidden state BEFORE the stack (early_exit.py:311)
    pad time to a multiple of 2 → downsample (stride 2) → 1-layer
    Conformer → upsample (repeat ×2) → remove pad → add to the stack
    output (early_exit.py:356: enc = enc + enc_downsampled)

Length quirk preserved (reference mode): the branch Conformer's valid
length is clamp((orig_frames + pad) / 2, T_ds) computed from ORIGINAL
frame counts, not the /4-subsampled ones (early_exit.py:332-338) — for
typical utterances this saturates to "all frames valid".
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import conformer, subsampling
from early_exit_tpu.models.early_conformer import (_conformer_cfg,
                                                   apply_heads,
                                                   frontend_embed)
from early_exit_tpu.nn import core as nn

FACTOR = 2   # branch downsampling factor (early_exit.py:255)


def init(key: jax.Array, cfg: ModelConfig):
    k_sub, k_blocks, k_heads, k_par = jax.random.split(key, 4)
    ccfg = _conformer_cfg(cfg)
    n_layers = cfg.n_enc_exits * cfg.n_enc_layers_per_exit
    block_params, block_state = conformer.stack_init(k_blocks, ccfg, n_layers)
    head_keys = jax.random.split(k_heads, cfg.n_enc_exits)
    heads = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[nn.linear_init(k, cfg.d_model, cfg.vocab_size) for k in head_keys])
    # two parallel 1-layer branches (first exit, last exit)
    kp1, kp2 = jax.random.split(k_par)
    par0 = conformer.block_init(kp1, ccfg)
    par1 = conformer.block_init(kp2, ccfg)
    params = {
        "subsample": subsampling.conv_subsample_init(k_sub, cfg.n_mels,
                                                     cfg.d_model),
        "blocks": block_params,
        "heads": heads,
        "parallel": [par0[0], par1[0]],
    }
    state = {"blocks": block_state, "parallel": [par0[1], par1[1]]}
    return params, state


def _branch(par_params, par_state, x, lengths, sub_len, cfg: ModelConfig,
            rng, train):
    """The padded-downsample → conformer → upsample branch on (B, T', D)."""
    ccfg = _conformer_cfg(cfg)
    B, T, D = x.shape
    pad = (FACTOR - T % FACTOR) % FACTOR
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    x_ds = subsampling.downsample(x, FACTOR)
    t_ds = x_ds.shape[1]
    if cfg.length_mode == "reference":
        ds_len = jnp.minimum(((lengths + pad) / FACTOR).astype(jnp.int32),
                             t_ds)
    else:
        ds_len = jnp.minimum((sub_len + FACTOR - 1) // FACTOR, t_ds)
    mask = jnp.arange(t_ds)[None, :] < ds_len[:, None]
    y, new_state = conformer.block_apply(par_params, par_state, x_ds, mask,
                                         ccfg, rng=rng, train=train)
    y = subsampling.upsample(y, FACTOR)
    y = y[:, :T, :]
    return y, new_state


def apply(params, state, feats, lengths, cfg: ModelConfig, *,
          rng: Optional[jax.Array] = None, train: bool = False,
          log_probs: bool = True):
    """Returns (log_probs (n_exits, B, T', V), sub_lengths, new_state).

    log_probs=False returns raw head logits (argmax-equivalent for
    greedy decode; see early_conformer.apply_heads)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_pe, r_blocks, r_par0, r_par1 = jax.random.split(rng, 4)
    x, sub_len, mask = frontend_embed(params, feats, lengths, cfg,
                                      rng=r_pe, train=train)
    ccfg = _conformer_cfg(cfg)
    npe = cfg.n_enc_layers_per_exit
    E = cfg.n_enc_exits

    exit_hidden = []
    new_block_states = []
    new_par_states = []
    layer_rngs = jax.random.split(r_blocks, E)
    for e in range(E):
        branch_in = x
        sl = slice(e * npe, (e + 1) * npe)
        p_e = jax.tree_util.tree_map(lambda a: a[sl], params["blocks"])
        s_e = jax.tree_util.tree_map(lambda a: a[sl], state["blocks"])
        x, ns = conformer.stack_apply(p_e, s_e, x, mask, ccfg,
                                      rng=layer_rngs[e], train=train)
        new_block_states.append(ns)
        if e in (0, E - 1):
            bi = 0 if e == 0 else 1
            y, nps = _branch(params["parallel"][bi], state["parallel"][bi],
                             branch_in, lengths, sub_len, cfg,
                             r_par0 if bi == 0 else r_par1, train)
            new_par_states.append(nps)
            x = x + y
            if mask is not None:
                x = jnp.where(mask[..., None], x, 0.0)
        exit_hidden.append(x)

    hidden = jnp.stack(exit_hidden)                      # (E, B, T', D)
    out = apply_heads(params["heads"], hidden, cfg, log_probs=log_probs)
    new_state = {
        "blocks": jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *new_block_states),
        "parallel": new_par_states,
    }
    return out, sub_len, new_state

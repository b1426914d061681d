"""Early_zipformer: Zipformer-L-shaped U-Net Conformer (single exit).

Capability parity with ``Early_zipformer`` (models/model/early_exit.py:117-224):

- single conv subsample (k=3, s=2 → ~T/2; early_exit.py:153, 176)
- 2 full-rate Conformer blocks (early_exit.py:184-185)
- 5 U-Net stages with downsampling factors [2, 4, 8, 4, 2] and block
  counts [2, 4, 5, 4, 2] (early_exit.py:145-146): pad time to the factor →
  strided downsample → blocks → repeat-upsample → remove pad → residual
  add of the stage input (early_exit.py:187-216)
- output: extra ×2 downsample → single Linear(d, V) → log_softmax,
  returned with a leading exit axis of size ONE: (1, B, T'', V)
  (early_exit.py:218-224) — 19 blocks, one exit.

Config contract (README.md:61): n_enc_exits=19 = 2 + sum(stack) blocks of
n_enc_layers_per_exit=1 layers each.

Length quirk preserved in reference mode: stage lengths are
clamp((orig_frames + pad)/factor, T_stage) from ORIGINAL frame counts
(early_exit.py:199-203).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import conformer, subsampling
from early_exit_tpu.nn import core as nn

FACTORS = [2, 4, 8, 4, 2]
STACK = [2, 4, 5, 4, 2]


def n_blocks(cfg: ModelConfig) -> int:
    return 2 + sum(STACK)


def init(key: jax.Array, cfg: ModelConfig):
    if cfg.n_enc_exits != n_blocks(cfg):
        raise ValueError(
            f"early_zipformer requires n_enc_exits={n_blocks(cfg)} "
            f"(2 + sum({STACK})); got {cfg.n_enc_exits}")
    ccfg = _ccfg(cfg)
    k_sub, k_pre, k_stages, k_head = jax.random.split(key, 4)
    npe = cfg.n_enc_layers_per_exit
    pre_p, pre_s = conformer.stack_init(k_pre, ccfg, 2 * npe)
    stage_keys = jax.random.split(k_stages, len(STACK))
    stages = [conformer.stack_init(k, ccfg, n * npe)
              for k, n in zip(stage_keys, STACK)]
    params = {
        "subsample": subsampling.conv_subsample_init(k_sub, cfg.n_mels,
                                                     cfg.d_model, n_convs=1),
        "pre": pre_p,
        "stages": [s[0] for s in stages],
        "head": nn.linear_init(k_head, cfg.d_model, cfg.vocab_size),
    }
    state = {"pre": pre_s, "stages": [s[1] for s in stages]}
    return params, state


def _ccfg(cfg: ModelConfig):
    from early_exit_tpu.models.early_conformer import _conformer_cfg
    return _conformer_cfg(cfg)


def apply(params, state, feats, lengths, cfg: ModelConfig, *,
          rng: Optional[jax.Array] = None, train: bool = False,
          log_probs: bool = True):
    """Returns (log_probs (1, B, T'', V), out_lengths (B,), new_state).

    log_probs=False returns raw head logits (argmax-equivalent for
    greedy decode; see early_conformer.apply_heads)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    ccfg = _ccfg(cfg)
    rngs = jax.random.split(rng, 2 + len(STACK))

    # conv subsample (T/2) + PE + dropout
    x = subsampling.conv_subsample_apply(params["subsample"], feats,
                                         compute_dtype=cfg.dtype)
    t_sub = x.shape[1]
    x = x.astype(jnp.float32) + nn.sinusoidal_pe(t_sub, cfg.d_model)[None]
    if train:
        x = nn.dropout(x, cfg.drop_prob, rngs[0], train=True)
    if cfg.length_mode == "reference":
        base_len = jnp.minimum((lengths / 2).astype(jnp.int32), t_sub)
    else:
        base_len = jnp.minimum(subsampling.subsampled_length(lengths, 1),
                               t_sub)
    base_mask = jnp.arange(t_sub)[None, :] < base_len[:, None]
    x = jnp.where(base_mask[..., None], x, 0.0).astype(ccfg.rdtype)

    # two full-rate blocks
    x, new_pre = conformer.stack_apply(params["pre"], state["pre"], x,
                                       base_mask, ccfg, rng=rngs[1],
                                       train=train)

    new_stages = []
    for i, (factor, _nblk) in enumerate(zip(FACTORS, STACK)):
        src = x
        T = x.shape[1]
        pad = (factor - T % factor) % factor
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = subsampling.downsample(x, factor)
        t_ds = x.shape[1]
        if cfg.length_mode == "reference":
            ds_len = jnp.minimum(((lengths + pad) / factor).astype(jnp.int32),
                                 t_ds)
        else:
            ds_len = jnp.minimum((base_len + pad + factor - 1) // factor,
                                 t_ds)
        mask = jnp.arange(t_ds)[None, :] < ds_len[:, None]
        x, ns = conformer.stack_apply(params["stages"][i],
                                      state["stages"][i], x, mask, ccfg,
                                      rng=rngs[2 + i], train=train)
        new_stages.append(ns)
        x = subsampling.upsample(x, factor)
        if pad:
            x = x[:, :T, :]
        else:
            x = x[:, :T, :]
        x = x + src
        x = jnp.where(base_mask[..., None], x, 0.0)

    # output: extra ×2 downsample → single head
    out = subsampling.downsample(x, 2)
    logits = nn.linear(params["head"], out, compute_dtype=cfg.dtype)
    if log_probs:
        logits = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    out_len = jnp.minimum((base_len + 1) // 2, out.shape[1])
    new_state = {"pre": new_pre, "stages": new_stages}
    return logits[None], out_len, new_state

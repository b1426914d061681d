"""Confidence-gated dynamic early exit (beyond-reference feature).

The reference always computes every exit at inference (inference.py:66-72);
dynamic per-utterance halting exists only in the associated paper. Here it
is a first-class inference mode (the BASELINE.json north star): run the
trunk exit-by-exit inside a `lax.while_loop`, and STOP — later layers are
genuinely not executed — once the decoded confidence clears a threshold.

Confidence = mean over valid frames of the per-frame max posterior
probability at the exit's CTC head. The loop is batch-conservative: it
continues while ANY item in the (micro-)batch is below threshold; each
item keeps the log-probs of the FIRST exit that satisfied it. With B=1
(streaming / on-device serving, the paper's setting) this is exact
per-utterance halting.

XLA notes: the while_loop body dynamic-slices the exit's layer parameters
out of the stacked weights, so every iteration compiles once and shapes
stay static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import conformer
from early_exit_tpu.models.early_conformer import (_conformer_cfg,
                                                   frontend_embed)
from early_exit_tpu.nn import core as nn


def exit_confidence(log_probs: jax.Array, mask: jax.Array) -> jax.Array:
    """(B, T', V) log-probs, (B, T') validity -> (B,) mean max-prob."""
    max_p = jnp.exp(jnp.max(log_probs, axis=-1))          # (B, T')
    m = mask.astype(jnp.float32)
    return jnp.sum(max_p * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def gated_apply(params, state, feats, lengths, cfg: ModelConfig, *,
                threshold: float, item_mask=None):
    """Returns (log_probs (B, T', V) of each item's chosen exit,
    chosen_exit (B,) 1-based, sub_len (B,), n_exits_run ()).

    item_mask: optional (B,) 0/1 — rows padding the batch to a bucket
    size count as already satisfied (they have no valid frames, so their
    confidence is 0 and would otherwise force every exit to run)."""
    x, sub_len, mask = frontend_embed(params, feats, lengths, cfg,
                                      rng=None, train=False)
    ccfg = _conformer_cfg(cfg)
    npe = cfg.n_enc_layers_per_exit
    E = cfg.n_enc_exits
    B, Tp, _ = x.shape
    V = cfg.vocab_size

    def run_exit(e, h):
        """Run exit e's layer stack + head on hidden h."""
        p_e = jax.tree_util.tree_map(
            lambda a: lax.dynamic_slice_in_dim(a, e * npe, npe, axis=0),
            params["blocks"])
        s_e = jax.tree_util.tree_map(
            lambda a: lax.dynamic_slice_in_dim(a, e * npe, npe, axis=0),
            state["blocks"])
        h, _ = conformer.stack_apply(p_e, s_e, h, mask, ccfg, train=False)
        head = jax.tree_util.tree_map(
            lambda a: lax.dynamic_index_in_dim(a, e, axis=0,
                                               keepdims=False),
            params["heads"])
        logits = nn.linear(head, h, compute_dtype=cfg.dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return h, logp

    def cond(carry):
        e, h, chosen_lp, chosen_exit, done = carry
        return jnp.logical_and(e < E, ~jnp.all(done))

    def body(carry):
        e, h, chosen_lp, chosen_exit, done = carry
        h, logp = run_exit(e, h)
        conf = exit_confidence(logp, mask)
        ok = jnp.logical_or(conf >= threshold, e == E - 1)
        newly = jnp.logical_and(~done, ok)
        chosen_lp = jnp.where(newly[:, None, None], logp, chosen_lp)
        chosen_exit = jnp.where(newly, e + 1, chosen_exit)
        return e + 1, h, chosen_lp, chosen_exit, jnp.logical_or(done, ok)

    done0 = (jnp.zeros((B,), bool) if item_mask is None
             else item_mask < 0.5)
    init = (jnp.zeros((), jnp.int32), x,
            jnp.zeros((B, Tp, V), jnp.float32),
            jnp.zeros((B,), jnp.int32),
            done0)
    e_final, _, chosen_lp, chosen_exit, _ = lax.while_loop(cond, body, init)
    return chosen_lp, chosen_exit, sub_len, e_final

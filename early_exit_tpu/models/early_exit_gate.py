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

Supported encoders: early_conformer and splitformer (whose first/last
exits additionally run the parallel downsampled branch, selected inside
the loop by a `lax.cond` so non-branch exits pay nothing).
early_zipformer is single-exit by construction (reference README.md:61)
— there is nothing to gate; callers get a ValueError.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import conformer, splitformer
from early_exit_tpu.models.early_conformer import (_conformer_cfg,
                                                   frontend_embed)
from early_exit_tpu.nn import core as nn

GATED_MODEL_TYPES = ("early_conformer", "splitformer")


GATE_SCORES = ("maxprob", "margin", "negentropy")


def exit_confidence(log_probs: jax.Array, mask: jax.Array,
                    score: str = "maxprob") -> jax.Array:
    """(B, T', V) log-probs, (B, T') validity -> (B,) confidence in [0, 1].

    score selects the per-frame statistic (masked-mean over valid frames):
      maxprob    — max posterior probability (the round-2 default).
      margin     — top-1 minus top-2 probability: separates "peaked on one
                   token" from "split between two", which maxprob conflates.
      negentropy — 1 - H/log V: uses the whole distribution, the most
                   sensitive of the three to the flat tails that
                   out-of-distribution inputs produce (BENCH_NOTES.md
                   documents maxprob overconfidence under domain shift).
    """
    if score == "maxprob":
        frame = jnp.exp(jnp.max(log_probs, axis=-1))       # (B, T')
    elif score == "margin":
        top2 = lax.top_k(log_probs, 2)[0]                  # (B, T', 2)
        frame = jnp.exp(top2[..., 0]) - jnp.exp(top2[..., 1])
    elif score == "negentropy":
        p = jnp.exp(log_probs)
        ent = -jnp.sum(p * log_probs, axis=-1)             # (B, T')
        frame = 1.0 - ent / jnp.log(float(log_probs.shape[-1]))
    else:
        raise ValueError(f"score must be one of {GATE_SCORES}: {score!r}")
    m = mask.astype(jnp.float32)
    return jnp.sum(frame * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def gated_apply(params, state, feats, lengths, cfg: ModelConfig, *,
                threshold, item_mask=None, score: str = "maxprob",
                temperatures=None):
    """Returns (log_probs (B, T', V) of each item's chosen exit,
    chosen_exit (B,) 1-based, sub_len (B,), n_exits_run ()).

    threshold: scalar, or a per-exit sequence of length n_enc_exits
    (tools/calibrate_gate.py fits per-exit thresholds on held-out data —
    shallow exits are systematically more overconfident than deep ones,
    so one shared threshold either over-escalates or under-escalates).

    item_mask: optional (B,) 0/1 — rows padding the batch to a bucket
    size count as already satisfied (they have no valid frames, so their
    confidence is 0 and would otherwise force every exit to run).

    score: confidence statistic, see exit_confidence.

    temperatures: optional per-exit sequence; exit e's CONFIDENCE is
    computed from softmax(logits / temperatures[e]) (standard temperature
    calibration). The returned log-probs for decoding stay unscaled —
    greedy argmax is temperature-invariant and beams should see the
    model's true posterior."""
    if cfg.model_type not in GATED_MODEL_TYPES:
        raise ValueError(
            f"gated_apply supports {GATED_MODEL_TYPES}; "
            f"{cfg.model_type!r} has a single output exit — nothing to "
            "gate (reference README.md:61)")
    x, sub_len, mask = frontend_embed(params, feats, lengths, cfg,
                                      rng=None, train=False)
    ccfg = _conformer_cfg(cfg)
    npe = cfg.n_enc_layers_per_exit
    E = cfg.n_enc_exits
    B, Tp, _ = x.shape
    V = cfg.vocab_size

    thr = jnp.broadcast_to(jnp.asarray(threshold, jnp.float32), (E,))
    temps = (None if temperatures is None else
             jnp.broadcast_to(jnp.asarray(temperatures, jnp.float32), (E,)))

    is_split = cfg.model_type == "splitformer"
    if is_split:
        # first/last-exit parallel branches, stacked on a leading axis so
        # the loop body can dynamic-index the right one (0 at exit 0,
        # 1 at exit E-1 — splitformer.apply's `bi`)
        par_p = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]),
            params["parallel"][0], params["parallel"][1])
        par_s = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]),
            state["parallel"][0], state["parallel"][1])

    def run_exit(e, h):
        """Run exit e's layer stack (+ splitformer branch) + head."""
        h_in = h                       # branch input: hidden BEFORE stack
        p_e = jax.tree_util.tree_map(
            lambda a: lax.dynamic_slice_in_dim(a, e * npe, npe, axis=0),
            params["blocks"])
        s_e = jax.tree_util.tree_map(
            lambda a: lax.dynamic_slice_in_dim(a, e * npe, npe, axis=0),
            state["blocks"])
        h, _ = conformer.stack_apply(p_e, s_e, h, mask, ccfg, train=False)
        if is_split:
            def with_branch(hs):
                bi = jnp.where(e == 0, 0, 1)
                pp = jax.tree_util.tree_map(
                    lambda a: lax.dynamic_index_in_dim(a, bi, axis=0,
                                                       keepdims=False),
                    par_p)
                ps = jax.tree_util.tree_map(
                    lambda a: lax.dynamic_index_in_dim(a, bi, axis=0,
                                                       keepdims=False),
                    par_s)
                y, _ = splitformer._branch(pp, ps, h_in, lengths, sub_len,
                                           cfg, None, False)
                out = hs + y
                return (jnp.where(mask[..., None], out, 0.0)
                        if mask is not None else out)
            h = lax.cond(jnp.logical_or(e == 0, e == E - 1),
                         with_branch, lambda hs: hs, h)
        head = jax.tree_util.tree_map(
            lambda a: lax.dynamic_index_in_dim(a, e, axis=0,
                                               keepdims=False),
            params["heads"])
        logits = nn.linear(head, h, compute_dtype=cfg.dtype)
        logits = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        if temps is None:
            conf_lp = logp
        else:
            conf_lp = jax.nn.log_softmax(logits / temps[e], axis=-1)
        return h, logp, exit_confidence(conf_lp, mask, score)

    def cond(carry):
        e, h, chosen_lp, chosen_exit, done = carry
        return jnp.logical_and(e < E, ~jnp.all(done))

    def body(carry):
        e, h, chosen_lp, chosen_exit, done = carry
        h, logp, conf = run_exit(e, h)
        ok = jnp.logical_or(conf >= thr[e], e == E - 1)
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

"""Two-phase cascade serving for confidence-gated early exit.

The `lax.while_loop` gate (models/early_exit_gate.py) is exact for B=1
streaming, but BATCH-conservative: one unconfident row forces the whole
batch through every remaining exit, so at serving batch sizes a single
hard utterance erases the early-exit saving. The TPU-idiomatic fix is a
two-phase CASCADE with re-batching — the standard big-batch serving
pattern, expressed as two statically-shaped XLA programs:

  Phase A (`shallow_apply`): a FIXED-cost run of exits 1..k on every
  row — one compiled program, MXU-dense, no data-dependent control
  flow. Rows whose calibrated confidence clears the per-exit threshold
  at some exit <= k are DONE. The phase also returns the layer-k*npe
  hidden state, kept device-resident.

  Re-batch (host): only the (small) boolean accept mask crosses to the
  host. Unaccepted row INDICES are packed into dense batches
  (`pack_escalation_indices`); the hidden states themselves never leave
  the device — phase B gathers them with `jnp.take`.

  Phase B (`continue_apply`): CONTINUES the trunk from the cached
  layer-k hidden (no recompute of layers 1..k*npe) for the packed rows
  only, running exits k+1..E with the same earliest-confident-exit
  selection (final exit as fallback).

Per-utterance decisions are IDENTICAL to `gated_apply` (the earliest
exit whose calibrated confidence clears its threshold, else the final
exit — tests/test_cascade.py pins the equivalence row-for-row), but the
computed cost is k exits for accepted rows and E for escalated ones,
instead of the batch-max everywhere. Expected cost per utterance is
  k + (1 - cum_accept(k)) * (E - k)
exits; `choose_k` minimizes it from calibration accept shares.

Reference contrast: /root/reference/inference.py:66-72 always computes
every exit for every utterance; no analogue of this exists there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from early_exit_tpu.configs import ModelConfig
from early_exit_tpu.models import conformer
from early_exit_tpu.models.early_conformer import (_conformer_cfg,
                                                   frontend_embed)
from early_exit_tpu.models.early_exit_gate import exit_confidence
from early_exit_tpu.nn import core as nn


def _check_model(cfg: ModelConfig):
    if cfg.model_type != "early_conformer":
        raise ValueError(
            "cascade serving supports early_conformer (the flagship); "
            f"got {cfg.model_type!r} — splitformer's exit-1/exit-E "
            "parallel branches make the layer-k hidden non-resumable, "
            "use gated_apply for it")


def _slice_layers(tree, lo: int, hi: int):
    return jax.tree_util.tree_map(lambda a: a[lo:hi], tree)


def _reachable(threshold, e0: int, M: int):
    """Which of exits e0..e0+M-1 can ever accept. All confidence scores
    live in [0, 1], so a CONCRETE per-exit threshold > 1.0 (the
    calibrator emits 2.0 for "never accept here") means that exit's
    head, softmax and confidence are dead compute — skip them at trace
    time. Traced thresholds (e.g. runtime arrays in exported programs)
    conservatively keep every exit."""
    if isinstance(threshold, jax.Array) or not hasattr(threshold,
                                                      "__len__"):
        return [True] * M
    try:
        return [float(threshold[e0 + i]) <= 1.0 for i in range(M)]
    except (TypeError, ValueError):
        return [True] * M


def _exit_logp_conf(heads, hidden, mask, cfg: ModelConfig, *,
                    e0: int, score: str, temperatures,
                    reachable=None):
    """hidden (M, B, T', D) for exits e0..e0+M-1 (0-based) ->
    (logp (M, B, T', V) fp32, conf (M, B)). Exits marked unreachable
    get conf=-inf and a zero logp buffer without running their head."""
    M, B, Tp, _ = hidden.shape
    V = cfg.vocab_size
    if reachable is None:
        reachable = [True] * M
    temps = (None if temperatures is None else jnp.broadcast_to(
        jnp.asarray(temperatures, jnp.float32), (cfg.n_enc_exits,)))
    logps, confs = [], []
    for i in range(M):
        if not reachable[i] and i != M - 1:
            # i == M-1 stays computed in phase B (final-exit fallback
            # logp is decoded); callers never select an unreachable
            # NON-final slot, so zeros are fine there
            logps.append(jnp.zeros((B, Tp, V), jnp.float32))
            confs.append(jnp.full((B,), -jnp.inf, jnp.float32))
            continue
        head_p = jax.tree_util.tree_map(lambda a: a[e0 + i], heads)
        logits = nn.linear(head_p, hidden[i], compute_dtype=cfg.dtype)
        logits = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        conf_lp = (logp if temps is None else
                   jax.nn.log_softmax(logits / temps[e0 + i], axis=-1))
        logps.append(logp)
        confs.append(exit_confidence(conf_lp, mask, score)
                     if reachable[i]
                     else jnp.full((B,), -jnp.inf, jnp.float32))
    return jnp.stack(logps), jnp.stack(confs)


def _earliest_ok(conf, thr, *, fallback_last: bool):
    """conf (M, B), thr (M,) -> (chosen_rel (B,) in 0..M-1 or M if none
    and not fallback_last, accepted (B,))."""
    ok = conf >= thr[:, None]                                  # (M, B)
    if fallback_last:
        ok = ok.at[-1].set(True)
    accepted = jnp.any(ok, axis=0)
    first = jnp.argmax(ok, axis=0)                             # (B,)
    return jnp.where(accepted, first, ok.shape[0]), accepted


def shallow_apply(params, state, feats, lengths, cfg: ModelConfig, *,
                  k: int, threshold, score: str = "maxprob",
                  temperatures=None, item_mask=None):
    """Phase A: run exits 1..k at fixed cost.

    Returns (logp_sel (B, T', V) — the chosen exit's log-probs for
    accepted rows, exit-k's otherwise; chosen (B,) 1-based, 0 where
    unaccepted; accepted (B,) bool; sub_len (B,); h_k (B, T', D) the
    layer-k*npe hidden to resume from).

    item_mask: rows with 0 are padding — reported accepted (they must
    not be escalated) with chosen=0."""
    _check_model(cfg)
    E, npe = cfg.n_enc_exits, cfg.n_enc_layers_per_exit
    if not 1 <= k < E:
        raise ValueError(f"k must be in [1, {E - 1}]: {k}")
    x, sub_len, mask = frontend_embed(params, feats, lengths, cfg,
                                      rng=None, train=False)
    ccfg = _conformer_cfg(cfg)
    h_k, _, exit_h = conformer.stack_apply(
        _slice_layers(params["blocks"], 0, k * npe),
        _slice_layers(state["blocks"], 0, k * npe),
        x, mask, ccfg, train=False,
        collect_outputs=True, collect_every=npe)       # (k, B, T', D)
    thr = jnp.broadcast_to(jnp.asarray(threshold, jnp.float32), (E,))
    logp, conf = _exit_logp_conf(params["heads"], exit_h, mask, cfg,
                                 e0=0, score=score,
                                 temperatures=temperatures,
                                 reachable=_reachable(threshold, 0, k))
    chosen_rel, accepted = _earliest_ok(conf, thr[:k],
                                        fallback_last=False)
    logp_sel = jnp.take_along_axis(
        logp, jnp.minimum(chosen_rel, k - 1)[None, :, None, None],
        axis=0)[0]
    chosen = jnp.where(accepted, chosen_rel + 1, 0).astype(jnp.int32)
    if item_mask is not None:
        pad = jnp.asarray(item_mask) < 0.5
        accepted = jnp.logical_or(accepted, pad)
        chosen = jnp.where(pad, 0, chosen)
    return logp_sel, chosen, accepted, sub_len, h_k


def continue_apply(params, state, h_k, sub_len, cfg: ModelConfig, *,
                   k: int, threshold, score: str = "maxprob",
                   temperatures=None):
    """Phase B: resume the trunk from the layer-k*npe hidden `h_k`
    (B', T', D — typically a packed gather of phase A's output) and run
    exits k+1..E with earliest-confident selection (final exit as
    fallback).

    Returns (logp_sel (B', T', V), chosen (B,) 1-based absolute exit)."""
    _check_model(cfg)
    E, npe = cfg.n_enc_exits, cfg.n_enc_layers_per_exit
    if not 1 <= k < E:
        raise ValueError(f"k must be in [1, {E - 1}]: {k}")
    Tp = h_k.shape[1]
    mask = jnp.arange(Tp)[None, :] < sub_len[:, None]
    ccfg = _conformer_cfg(cfg)
    _, _, exit_h = conformer.stack_apply(
        _slice_layers(params["blocks"], k * npe, E * npe),
        _slice_layers(state["blocks"], k * npe, E * npe),
        h_k, mask, ccfg, train=False,
        collect_outputs=True, collect_every=npe)   # (E-k, B', T', D)
    thr = jnp.broadcast_to(jnp.asarray(threshold, jnp.float32), (E,))
    logp, conf = _exit_logp_conf(params["heads"], exit_h, mask, cfg,
                                 e0=k, score=score,
                                 temperatures=temperatures,
                                 reachable=_reachable(threshold, k,
                                                      E - k))
    chosen_rel, _ = _earliest_ok(conf, thr[k:], fallback_last=True)
    logp_sel = jnp.take_along_axis(
        logp, chosen_rel[None, :, None, None], axis=0)[0]
    return logp_sel, (k + 1 + chosen_rel).astype(jnp.int32)


def pack_escalation_indices(accepted: np.ndarray, pack_batch: int):
    """Host-side re-batching plan. accepted: (B,) bool (phase A output,
    the ONLY thing that crosses to the host). Returns (idx (M,) int32,
    item_mask (M,) float32) with M the escalated count padded up to a
    multiple of `pack_batch` (0 rows, masked out, when none escalate —
    callers skip phase B entirely then). Padding repeats index 0 with
    item_mask 0; phase B's gather stays dense and statically shaped."""
    accepted = np.asarray(accepted, bool)
    esc = np.nonzero(~accepted)[0].astype(np.int32)
    n = len(esc)
    if n == 0:
        return (np.zeros((0,), np.int32), np.zeros((0,), np.float32))
    m = ((n + pack_batch - 1) // pack_batch) * pack_batch
    idx = np.zeros((m,), np.int32)
    idx[:n] = esc
    item_mask = np.zeros((m,), np.float32)
    item_mask[:n] = 1.0
    return idx, item_mask


def choose_k(accept_shares, n_exits: int) -> int:
    """Pick the phase-A depth minimizing expected exits per utterance,
    cost(k) = k + (1 - cum_accept(k)) * (n_exits - k), from the
    calibration's per-exit accept shares (tools/calibrate_gate.py
    `accept_share`, the share of dev utterances whose FIRST confident
    exit is e). Shares beyond index k-1 count as escalations."""
    shares = list(accept_shares)[:n_exits]
    best_k, best_cost = 1, float("inf")
    for k in range(1, n_exits):
        cum = float(sum(shares[:k]))
        cost = k + (1.0 - min(cum, 1.0)) * (n_exits - k)
        if cost < best_cost:
            best_k, best_cost = k, cost
    return best_k

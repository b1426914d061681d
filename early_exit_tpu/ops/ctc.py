"""CTC loss and greedy decoding, TPU-native.

Replaces the reference's `torch.nn.CTCLoss(blank=0, zero_infinity=True)`
(train.py:259) with a log-semiring forward recursion written as a
`lax.scan` over time. Per-step label-state scores are computed with one
MXU matmul against precomputed label one-hots instead of per-step gathers.

Semantics parity with torch:
- labels may contain any ids (the reference trains on targets that include
  BOS/EOS, train.py:61); blank = 0.
- reduction="mean" divides each item's NLL by its label length, then means
  over the batch (torch CTCLoss default).
- zero_infinity: items whose alignment is infeasible (input too short)
  contribute 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

NEG = -1e30


def _expand_labels(labels: jax.Array, blank: int) -> jax.Array:
    """(B, L) -> (B, 2L+1) blank-interleaved state sequence."""
    B, L = labels.shape
    z = jnp.full((B, 2 * L + 1), blank, labels.dtype)
    return z.at[:, 1::2].set(labels)


def ctc_neg_log_likelihood(log_probs: jax.Array, input_lengths: jax.Array,
                           labels: jax.Array, label_lengths: jax.Array,
                           blank: int = 0, *, unroll: int = 8) -> jax.Array:
    """Per-example CTC negative log-likelihood.

    log_probs: (B, T, V) log-softmax outputs.
    input_lengths: (B,) valid frames (<= T).
    labels: (B, L) padded label ids; label_lengths: (B,) valid labels (<= L).
    Returns (B,) NLL; ~1e30 where the alignment is infeasible.
    """
    B, T, V = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1

    z = _expand_labels(labels, blank)                      # (B, S)
    # lp_z[b, t, s] = log_probs[b, t, z[b, s]] via one-hot matmul (MXU)
    z_onehot = jax.nn.one_hot(z, V, dtype=log_probs.dtype)  # (B, S, V)
    lp_z = jnp.einsum("btv,bsv->bts", log_probs, z_onehot,
                      preferred_element_type=jnp.float32)   # (B, T, S)

    # skip transition allowed where z_s != blank and z_s != z_{s-2}
    z_prev2 = jnp.concatenate([jnp.full((B, 2), blank, z.dtype), z[:, :-2]],
                              axis=1)
    can_skip = (z != blank) & (z != z_prev2)
    can_skip = can_skip.at[:, :2].set(False)                # s in {0,1}: no skip

    alpha0 = jnp.full((B, S), NEG, jnp.float32)
    alpha0 = alpha0.at[:, 0].set(lp_z[:, 0, 0])
    has_label = label_lengths > 0
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, lp_z[:, 0, 1], NEG))

    lp_z_t = jnp.moveaxis(lp_z, 1, 0)                       # (T, B, S)
    t_index = jnp.arange(1, T)

    def body(alpha, xs):
        lp_t, t = xs
        stay = alpha
        move = jnp.concatenate([jnp.full((B, 1), NEG), alpha[:, :-1]], axis=1)
        skip = jnp.concatenate([jnp.full((B, 2), NEG), alpha[:, :-2]], axis=1)
        skip = jnp.where(can_skip, skip, NEG)
        new = jnp.logaddexp(jnp.logaddexp(stay, move), skip) + lp_t
        # freeze once past this item's input length
        active = (t < input_lengths)[:, None]
        alpha = jnp.where(active, new, alpha)
        return alpha, None

    # unroll: the per-step state (B, 2L+1) is tiny, so sequential-step
    # launch latency dominates; unrolling fuses several steps per loop
    # iteration (~2x faster fwd+bwd on TPU at T'=250)
    alpha, _ = lax.scan(body, alpha0, (lp_z_t[1:], t_index),
                        unroll=unroll)

    # final states: s = 2*len-1 (last label) and s = 2*len (trailing blank)
    last = 2 * label_lengths - 1
    last = jnp.clip(last, 0, S - 1)
    blank_last = jnp.clip(2 * label_lengths, 0, S - 1)
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_blank = jnp.take_along_axis(alpha, blank_last[:, None], axis=1)[:, 0]
    total = jnp.where(has_label, jnp.logaddexp(a_last, a_blank), a_blank)
    return -total


def ctc_loss(log_probs: jax.Array, input_lengths: jax.Array,
             labels: jax.Array, label_lengths: jax.Array, *,
             blank: int = 0, reduction: str = "mean",
             zero_infinity: bool = True) -> jax.Array:
    """torch.nn.CTCLoss-compatible reduction over ctc_neg_log_likelihood."""
    nll = ctc_neg_log_likelihood(log_probs, input_lengths, labels,
                                 label_lengths, blank)
    if zero_infinity:
        nll = jnp.where(nll > 1e29, 0.0, nll)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    # torch "mean": divide by target length, then batch mean
    denom = jnp.maximum(label_lengths, 1).astype(jnp.float32)
    return jnp.mean(nll / denom)


# --------------------------------------------------------------------------
# Cross-entropy (AED decoder loss)
# --------------------------------------------------------------------------

def cross_entropy(logits: jax.Array, targets: jax.Array, *,
                  ignore_index: int | None = None) -> jax.Array:
    """torch.nn.CrossEntropyLoss parity (mean reduction).

    logits: (..., V) raw; targets: (...) int ids. With ignore_index=None
    every position counts — matching the reference's AED CE which does NOT
    mask padding (train.py:47, 258: CrossEntropyLoss() on raw pad-filled
    targets; torch's default ignore_index=-100 never matches real ids).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if ignore_index is None:
        return jnp.mean(nll)
    mask = (targets != ignore_index).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# --------------------------------------------------------------------------
# Greedy decoding
# --------------------------------------------------------------------------

def greedy_decode(log_probs: jax.Array, lengths: jax.Array, *,
                  blank: int = 0):
    """Batched best-path decode: argmax → collapse repeats → drop blanks.

    Parity with GreedyCTCDecoder (util/beam_infer.py:9-24), vectorized and
    jittable with static shapes.

    log_probs: (B, T, V) — log-probs or raw logits: only the per-frame
    argmax is used, which is softmax-invariant. lengths: (B,).
    Returns (tokens (B, T) padded with `blank`, n_tokens (B,)).
    """
    best = jnp.argmax(log_probs, axis=-1)                  # (B, T)
    return greedy_decode_ids(best, lengths, blank=blank)


def greedy_decode_ids(best: jax.Array, lengths: jax.Array, *,
                      blank: int = 0):
    """greedy_decode starting from precomputed per-frame argmax ids
    (B, T) — the entry point for fused head+argmax kernels
    (ops/pallas/head_argmax.py) that never materialize logits."""
    B, T = best.shape
    t_idx = jnp.arange(T)[None, :]
    valid = t_idx < lengths[:, None]
    prev = jnp.concatenate([jnp.full((B, 1), -1, best.dtype), best[:, :-1]],
                           axis=1)
    keep = (best != blank) & (best != prev) & valid        # (B, T)

    # stable compaction: position of each kept token in the output.
    # Expressed as a (T, T) one-hot permutation matmul per item — XLA
    # scatter is pathologically slow on TPU, the batched matmul runs on
    # the MXU in tens of microseconds at these shapes.
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1   # (B, T)
    n_tokens = jnp.sum(keep, axis=1)
    scatter_pos = jnp.where(keep, pos, T)                  # dump discards
    if T <= 1024:
        # the (B, T, T) one-hot is quadratic in T — fine here, and the
        # batched matmul runs on the MXU in tens of microseconds
        onehot = (scatter_pos[:, :, None] ==
                  jnp.arange(T)[None, None, :])            # (B, T, T')
        vals = jnp.where(keep, best, 0).astype(jnp.float32)  # ids < 2^24
        out = jnp.einsum("bt,btp->bp", vals, onehot.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        out = out.astype(best.dtype)
    else:
        # long-T fallback: O(B·T) scatter instead of an O(B·T²) one-hot
        # (B=128, T=1500 would materialize >1 GB above)
        vals = jnp.where(keep, best, 0)
        out = jnp.zeros((B, T), best.dtype).at[
            jnp.arange(B)[:, None], scatter_pos].set(vals, mode="drop")
    if blank != 0:   # unfilled output slots must read as blank
        filled = jnp.arange(T)[None, :] < n_tokens[:, None]
        out = jnp.where(filled, out, blank)
    return out, n_tokens

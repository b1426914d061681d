"""Joint CTC + attention rescoring of the AED beam's n-best.

The reference ships this path but never finished it: `beam_search`'s
`return_best_beam=False` branch (util/beam_infer.py:309-383) is entirely
commented out — it scores each n-best hypothesis against the CTC head's
emission via a forced-alignment trellis, length-normalizes, converts both
the attention score and the CTC score to probability space, divides each
by its max over the n-best, and picks the argmax of
``w * s_ctc + (1 - w) * s_pred`` (util/beam_infer.py:355-383).

This module completes that path TPU-natively:

- the per-hypothesis CTC score is the exact log-marginal ``log p(y|x)``
  from the log-semiring CTC forward (ops/ctc.py) — a strict upgrade over
  the commented code's single-best Viterbi path score — batched over all
  K beam lanes at once and vmappable over utterances;
- the combination reproduces the reference's max-normalized prob-space
  weighting, computed stably as ``exp(s - max(s))`` (identical to
  ``exp(s)/max(exp(s))`` without the underflow).

Hypothesis token sequences keep their leading BOS and trailing EOS: the
CTC heads are trained with bos/eos in the targets (reference
data_loader.py:207-209), so the emission expects them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from early_exit_tpu.ops.ctc import ctc_neg_log_likelihood


def ctc_lane_scores(ctc_log_probs: jax.Array, n_frames: jax.Array,
                    tokens: jax.Array, lengths: jax.Array, *,
                    blank: int = 0) -> jax.Array:
    """Length-normalized CTC log-likelihood of K hypotheses of ONE
    utterance.

    ctc_log_probs: (T, V) log-softmax CTC emission of the utterance.
    n_frames: scalar valid frame count (<= T).
    tokens: (K, L) padded hypothesis ids (incl. BOS/EOS, as trained).
    lengths: (K,) valid token counts.
    Returns (K,) ``log p(y|x) / |y|`` (the reference normalizes its
    alignment score by ``len(f_t)``, util/beam_infer.py:352).
    Infeasible alignments (|y| too long for n_frames) score ~-1e30.
    """
    K = tokens.shape[0]
    lp = jnp.broadcast_to(ctc_log_probs[None], (K,) + ctc_log_probs.shape)
    nf = jnp.broadcast_to(jnp.asarray(n_frames, jnp.int32), (K,))
    nll = ctc_neg_log_likelihood(lp, nf, tokens, lengths, blank=blank)
    return -nll / jnp.maximum(lengths, 1).astype(nll.dtype)


def joint_rescore(aed_scores: jax.Array, ctc_scores: jax.Array,
                  ctc_weight: float):
    """Combine per-lane attention and CTC scores; pick the best lane.

    Reproduces the reference's formula (util/beam_infer.py:355-377):
    both score vectors go to probability space, are normalized by their
    max over the lanes, and are mixed ``w*s_ctc + (1-w)*s_pred``.
    ``exp(s - max(s))`` == ``exp(s)/max(exp(s))``, computed stably.

    aed_scores / ctc_scores: (..., K). Returns (best_idx (...,),
    combined (..., K)).
    """
    sp = jnp.exp(aed_scores - jnp.max(aed_scores, axis=-1, keepdims=True))
    sc = jnp.exp(ctc_scores - jnp.max(ctc_scores, axis=-1, keepdims=True))
    s = ctc_weight * sc + (1.0 - ctc_weight) * sp
    return jnp.argmax(s, axis=-1), s


def rescore_batch(ctc_log_probs: jax.Array, n_frames: jax.Array,
                  tokens: jax.Array, lengths: jax.Array,
                  aed_scores: jax.Array, *, ctc_weight: float,
                  blank: int = 0):
    """Batched joint rescoring of beam output.

    ctc_log_probs: (B, T, V) CTC emissions of one exit.
    n_frames: (B,) valid frames. tokens: (B, K, L); lengths, aed_scores:
    (B, K) — the ``beam_search_exit_batch`` output shapes.
    Returns (best (B,), combined (B, K), ctc_scores (B, K)).
    """
    ctc_s = jax.vmap(
        lambda lp, nf, tk, ln: ctc_lane_scores(lp, nf, tk, ln, blank=blank)
    )(ctc_log_probs, n_frames, tokens, lengths)
    best, s = joint_rescore(aed_scores, ctc_s, ctc_weight)
    return best, s, ctc_s

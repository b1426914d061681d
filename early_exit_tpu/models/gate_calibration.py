"""Gate calibration: fit per-exit temperatures + thresholds on held-out data.

Beyond-reference feature (the reference computes every exit and has no
dynamic gate, inference.py:66-72). The confidence gate
(models/early_exit_gate.py) halts at the first exit whose confidence
clears a threshold; BENCH_NOTES.md documents that raw mean-max-prob is
systematically overconfident — shallow exits more than deep ones, and
badly so under domain shift. The standard fixes, implemented here on
host-side numpy (calibration is a one-off, not a hot path):

  * temperature scaling (Guo et al. 2017): per exit, pick T minimizing
    the NLL of utterance-correctness under the scaled confidence;
  * sequential threshold fitting: exits are cut in gate order so that
    the SIMULATED gated corpus WER stays within `target_wer_delta` of
    the final exit's — calibrating the operating point with a guarantee
    that holds under composition (per-exit accepted-set constraints
    alone do not compose; see fit_sequential_thresholds).

`tools/calibrate_gate.py` drives this end to end and writes a JSON
consumed by `inference.py --gate_calibration`.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from early_exit_tpu.models.early_exit_gate import exit_confidence

_grid = np.geomspace(0.25, 8.0, 21)
_grid[np.argmin(np.abs(_grid - 1.0))] = 1.0     # exact identity point
DEFAULT_TEMP_GRID = tuple(float(t) for t in _grid)


def scaled_confidence(log_probs: jax.Array, mask: jax.Array,
                      score: str, temperature: float) -> jax.Array:
    """Confidence after temperature scaling. Scaling normalized
    log-probs equals scaling the logits: softmax((z - c)/T) =
    softmax(z/T) for any per-frame constant c."""
    lp = jax.nn.log_softmax(log_probs / temperature, axis=-1)
    return exit_confidence(lp, mask, score)


def ece(conf: np.ndarray, correct: np.ndarray, n_bins: int = 10) -> float:
    """Expected calibration error of P(utterance correct | confidence)."""
    conf = np.asarray(conf, np.float64)
    correct = np.asarray(correct, np.float64)
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    total = len(conf)
    out = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        in_bin = (conf >= lo) & (conf < hi if hi < 1.0 else conf <= hi)
        if not in_bin.any():
            continue
        out += (in_bin.sum() / total) * abs(conf[in_bin].mean()
                                            - correct[in_bin].mean())
    return float(out)


def fit_temperature(conf_by_temp: np.ndarray, temps: Sequence[float],
                    correct: np.ndarray) -> int:
    """conf_by_temp: (K, N) confidence of each utterance at each grid
    temperature; correct: (N,) 0/1. Returns the index of the grid
    temperature minimizing binary NLL of correctness — the discrete
    analogue of Guo et al.'s NLL minimization (confidence is a
    monotone-in-T statistic, so a grid is exact enough)."""
    conf = np.clip(np.asarray(conf_by_temp, np.float64), 1e-6, 1 - 1e-6)
    correct = np.asarray(correct, np.float64)[None, :]
    nll = -(correct * np.log(conf)
            + (1 - correct) * np.log1p(-conf)).mean(axis=1)
    return int(np.argmin(nll))


def pick_threshold(conf: np.ndarray, errors: np.ndarray,
                   words: np.ndarray, target_wer: float):
    """Smallest threshold whose accepted set {conf >= thr} has corpus
    WER (sum errors / sum words) <= target_wer, maximizing acceptance.

    Returns (threshold, accept_rate, accepted_wer). When even the single
    most-confident utterance violates the target, returns threshold 2.0
    (unreachable — the gate then never stops at this exit)."""
    conf = np.asarray(conf, np.float64)
    errors = np.asarray(errors, np.float64)
    words = np.asarray(words, np.float64)
    order = np.argsort(-conf)                     # most confident first
    cum_err = np.cumsum(errors[order])
    cum_wrd = np.maximum(np.cumsum(words[order]), 1.0)
    ok = (cum_err / cum_wrd) <= target_wer + 1e-12
    # largest prefix that is ok AND not split inside a tie: every
    # utterance with conf >= the threshold must be accepted, so the
    # prefix must end at a strict confidence drop
    n = len(conf)
    best = 0
    for k in np.flatnonzero(ok) + 1:              # prefix length k
        if k < n and conf[order[k]] == conf[order[k - 1]]:
            continue                              # tie crosses the cut
        best = max(best, int(k))
    if best == 0:
        return 2.0, 0.0, float("nan")
    thr = float(conf[order[best - 1]])
    acc_wer = float(cum_err[best - 1] / cum_wrd[best - 1])
    return thr, best / n, acc_wer


def fit_sequential_thresholds(conf: np.ndarray, errors: np.ndarray,
                              words: np.ndarray, target_wer: float):
    """Fit per-exit thresholds so the SIMULATED gated corpus WER on this
    set is <= target_wer — guaranteed, not per-exit-hoped.

    Per-exit accepted-set constraints (pick_threshold) do not compose:
    each exit's accepted set can individually meet the target while their
    union under sequential gating exceeds it. This fitter walks exits in
    gate order, keeping the invariant "errors committed so far + the
    final exit's errors on everything still unaccepted <= target": exit
    e's threshold is the loosest cut of the REMAINING utterances that
    preserves it. At e=0 with nothing accepted the invariant is the
    final-exit WER itself, which satisfies any target >= it, so a valid
    (possibly fully-escalating) setting always exists.

    conf, errors: (E, N); words: (N,). Returns thresholds list (the last
    exit's is 0.0 — it must accept)."""
    conf = np.asarray(conf, np.float64)
    errors = np.asarray(errors, np.float64)
    words = np.asarray(words, np.float64)
    E, N = conf.shape
    total_words = max(float(words.sum()), 1.0)
    budget = target_wer * total_words + 1e-9      # allowed total errors
    committed = 0.0
    remaining = np.ones(N, bool)
    thresholds = []
    for e in range(E - 1):
        idx = np.flatnonzero(remaining)
        order = idx[np.argsort(-conf[e, idx])]
        # errors if the gate stops here for a prefix, final exit for rest
        rest_final = errors[E - 1, idx].sum()
        cum_here = np.cumsum(errors[e, order])
        cum_final = np.cumsum(errors[E - 1, order])
        # accepting prefix k: committed + cum_here[k-1]
        #                     + (rest_final - cum_final[k-1])
        ok = committed + cum_here + (rest_final - cum_final) <= budget
        best = 0
        for k in np.flatnonzero(ok) + 1:
            if (k < len(order)
                    and conf[e, order[k]] == conf[e, order[k - 1]]):
                continue                          # tie crosses the cut
            best = max(best, int(k))
        if best == 0:
            thresholds.append(2.0)
            continue
        thresholds.append(float(conf[e, order[best - 1]]))
        accepted = order[:best]
        committed += errors[e, accepted].sum()
        remaining[accepted] = False
    thresholds.append(0.0)                        # final exit accepts
    return thresholds


def simulate_gate(conf: np.ndarray, thresholds: Sequence[float],
                  errors: np.ndarray, words: np.ndarray):
    """conf, errors: (E, N); words: (N,). Each utterance stops at the
    first exit with conf >= threshold (the last exit always accepts).
    Returns (mean_exit, gated_wer, per-utterance chosen exit)."""
    conf = np.asarray(conf, np.float64)
    E, N = conf.shape
    thr = np.asarray(thresholds, np.float64).reshape(E, 1)
    accept = conf >= thr
    accept[-1, :] = True
    chosen = np.argmax(accept, axis=0)            # first True
    err = np.asarray(errors, np.float64)[chosen, np.arange(N)]
    w = max(float(np.sum(words)), 1.0)
    return (float(chosen.mean() + 1.0), float(err.sum() / w),
            chosen + 1)

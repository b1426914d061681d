"""Metrics: WER + structured training/eval logging.

The reference computes NO WER in-repo (transcripts are printed and scored
offline, SURVEY.md §4) and logs a single TensorBoard scalar per epoch
(train.py:117). Here:

- `wer` / `WerAccumulator`: in-framework word error rate (substitutions +
  insertions + deletions over reference words), per exit
- `MetricsLogger`: JSONL metrics stream (always) + TensorBoard via
  torch.utils.tensorboard when available — same `./runs/` convention
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List


def _edit_ops(ref: List[str], hyp: List[str]) -> int:
    """Levenshtein distance over word lists."""
    if len(ref) < len(hyp):
        # distance is symmetric
        ref, hyp = hyp, ref
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, 1):
        cur = [i]
        for j, h in enumerate(hyp, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (r != h)))
        prev = cur
    return prev[-1]


def wer(reference: str, hypothesis: str) -> float:
    ref = reference.split()
    hyp = hypothesis.split()
    if not ref:
        return 0.0 if not hyp else 1.0
    return _edit_ops(ref, hyp) / len(ref)


class WerAccumulator:
    """Corpus-level WER: total errors / total reference words."""

    def __init__(self):
        self.errors = 0
        self.words = 0
        self.utterances = 0

    def add(self, reference: str, hypothesis: str) -> None:
        ref = reference.split()
        self.errors += _edit_ops(ref, hypothesis.split())
        self.words += len(ref)
        self.utterances += 1

    @property
    def value(self) -> float:
        return self.errors / self.words if self.words else 0.0


class MetricsLogger:
    def __init__(self, log_dir: str = "runs", *, jsonl: bool = True,
                 tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = None
        if jsonl:
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                               buffering=1)
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()

"""Profiling & timing utilities (the reference has none — SURVEY.md §5).

- `trace(log_dir)`: context manager around `jax.profiler` producing a
  TensorBoard-loadable trace of device execution.
- `StepTimer`: wall-clock per-step timing with warmup discard, reporting
  steps/sec and (for ASR) real-time factor given audio seconds per batch.
- `annotate`: named trace span (shows up in the profiler timeline).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile"):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, warmup_steps: int = 2):
        self.warmup = warmup_steps
        self.n = 0
        self.total = 0.0
        self.audio_seconds = 0.0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, audio_seconds: float = 0.0):
        dt = time.perf_counter() - self._t0
        if self.n >= self.warmup:
            self.total += dt
            self.audio_seconds += audio_seconds
        self.n += 1
        return dt

    @property
    def steps_per_sec(self) -> float:
        steps = max(self.n - self.warmup, 0)
        return steps / self.total if self.total else 0.0

    @property
    def rtf_x(self) -> float:
        """Audio seconds processed per wall second (>1 = faster than RT)."""
        return self.audio_seconds / self.total if self.total else 0.0

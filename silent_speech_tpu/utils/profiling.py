"""Tracing and per-step timing (new subsystem; the reference has none —
SURVEY.md §5.1 lists only tqdm progress bars).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace for a window of steps,
- :class:`StepTimer` — cheap wall-clock step statistics (mean/p50/p90
  steps/sec) with periodic log lines; used by the trainers when
  ``--profile_steps`` is set.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import List, Optional


@contextlib.contextmanager
def trace(logdir: str):
    """Profile everything inside the block to ``logdir`` (view with
    TensorBoard's profile plugin or xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, log_every: int = 50, name: str = "train"):
        self.log_every = log_every
        self.name = name
        self._durations: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.time()
        if self._last is not None:
            self._durations.append(now - self._last)
            if self.log_every and len(self._durations) % self.log_every == 0:
                self.log()
        self._last = now

    def reset(self) -> None:
        self._durations = []
        self._last = None

    @property
    def steps_per_sec(self) -> float:
        if not self._durations:
            return 0.0
        return len(self._durations) / sum(self._durations)

    def percentile_ms(self, q: float) -> float:
        if not self._durations:
            return 0.0
        xs = sorted(self._durations)
        i = min(int(q / 100 * len(xs)), len(xs) - 1)
        return xs[i] * 1000.0

    def log(self) -> None:
        logging.info(
            "%s: %.2f steps/s (p50 %.1f ms, p90 %.1f ms, n=%d)",
            self.name, self.steps_per_sec, self.percentile_ms(50),
            self.percentile_ms(90), len(self._durations))

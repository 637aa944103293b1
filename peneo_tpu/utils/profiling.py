"""Profiling & step-timing utilities.

The reference has no tracing/profiling beyond a wall-clock average in the
inference service (SURVEY.md §5; deploy/inference.py:459-462). Here:

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory.
- :class:`StepTimer` — rolling per-step wall-clock stats for the train loop.
- :func:`device_memory_stats` — live HBM usage per device when the backend
  exposes it.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    import jax

    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 100):
        self._window = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._window.append(dt)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self._window) / len(self._window) if self._window else 0.0

    def throughput(self, items_per_step: int) -> float:
        m = self.mean
        return items_per_step / m if m else 0.0


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats() or {}
        except Exception:
            out[str(d)] = {}
    return out

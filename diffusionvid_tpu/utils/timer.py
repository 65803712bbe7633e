"""Timing + profiling helpers.

Replaces ``mega_core/utils/timer.py`` and the reference's commented-out
torch profiler hooks (engine/inference.py:20,43-53) with an always-available
wall-clock timer and a ``jax.profiler`` trace context (a strict upgrade:
TPU HLO-level traces instead of nothing, SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self._start = None

    def tic(self):
        self._start = time.perf_counter()

    def toc(self) -> float:
        assert self._start is not None, "toc() without tic()"
        dt = time.perf_counter() - self._start
        self.total_time += dt
        self.calls += 1
        self._start = None
        return dt

    @property
    def average_time(self) -> float:
        return self.total_time / max(self.calls, 1)


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

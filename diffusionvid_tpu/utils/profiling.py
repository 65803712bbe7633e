"""Tracing/profiling hooks — the designed-in upgrade over the reference's
commented-out ``torch.autograd.profiler`` blocks (SURVEY.md §5.1;
``engine/inference.py:20,43-53``, ``diffusion_det.py:15``).

Two entry points:

  * ``trace(logdir)`` — context manager around any region; writes an XLA
    trace viewable in TensorBoard / Perfetto (``jax.profiler``);
  * ``StepProfiler`` — train/eval-loop helper that captures exactly the
    requested step window (e.g. steps 10-15, skipping compile) and is a
    no-op when disabled, so it can stay wired in the hot loop.
"""

from __future__ import annotations

import contextlib
from typing import Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Trace the enclosed region to ``logdir`` (no-op when None)."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Capture a [start, stop) step window inside an iteration loop.

    Usage::

        prof = StepProfiler(args.profile_dir, start=10, stop=15)
        for it in range(max_iter):
            prof.step(it)
            ... run the step ...
        prof.close()
    """

    def __init__(self, logdir: Optional[str], start: int = 10,
                 stop: int = 15):
        self.logdir = logdir
        self.start = start
        self.stop = stop
        self._active = False

    def step(self, it: int) -> None:
        if not self.logdir:
            return
        import jax
        if it == self.start and not self._active:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif it == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False


def annotate(name: str):
    """Named sub-region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)

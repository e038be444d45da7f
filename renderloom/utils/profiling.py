"""Tracing / profiling hooks.

The reference's only observability is wall-clock prints
(``Pose_Guided_Neural_Rendering/train.py:75,83-85``; SURVEY.md §5.1).
renderloom exposes the XLA profiler as first-class utilities:

* :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-loadable trace (xplane) for a block of steps;
* :class:`StepTimer` — cheap EMA step timing with items/sec, for the
  console lines the trainers print;
* :func:`annotate` — named trace span (``jax.profiler.TraceAnnotation``)
  so host-side stages (h5 decode, batch assembly) show up in the
  timeline next to device work.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace into ``log_dir`` (view with TensorBoard's
    profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named host-side span inside an active trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Exponential-moving-average step timer."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        """Call once per step; returns the EMA step seconds."""
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else \
                (1 - self.alpha) * self.ema + self.alpha * dt
        self._last = now
        return self.ema

    def rate(self, items: int = 1) -> Optional[float]:
        return None if not self.ema else items / self.ema

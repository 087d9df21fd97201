"""Profiling + throughput observability.

The reference's only instrumentation is ad-hoc std::chrono timing
(reference/test.cpp:17-27, reference/solve3x3.cpp:49-64).  The TPU build
exposes:

* `trace(logdir)` — context manager around `jax.profiler` emitting an XPlane
  trace viewable in TensorBoard/Perfetto (kernel times, HBM traffic);
* `RateMeter` — a rays/s (or any unit/s) counter with EMA smoothing for
  long-running render/optimization loops.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RateMeter:
    """Exponential-moving-average throughput meter."""

    def __init__(self, unit: str = "rays", alpha: float = 0.2):
        self.unit = unit
        self.alpha = alpha
        self.rate: Optional[float] = None
        self.total = 0
        self._t_last: Optional[float] = None

    def tick(self, count: int) -> float:
        """Record `count` units processed since the previous tick."""
        now = time.perf_counter()
        if self._t_last is not None:
            dt = max(now - self._t_last, 1e-9)
            inst = count / dt
            self.rate = (
                inst
                if self.rate is None
                else self.alpha * inst + (1.0 - self.alpha) * self.rate
            )
        self._t_last = now
        self.total += count
        return self.rate or 0.0

    def __str__(self) -> str:
        r = self.rate or 0.0
        return f"{r:,.0f} {self.unit}/s (total {self.total:,})"

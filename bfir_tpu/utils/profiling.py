"""Latency/throughput observability.

The reference's only performance instrumentation is a vestigial ``__rdtsc``
pair (timestamp.h, used and discarded at delay.cpp:163-178) and FFTW wisdom
(SURVEY.md §5). Here:

- ``BlockTimer``: per-block latency histogram (p50/p95/p99) around the
  streaming step, with ``block_until_ready`` so device time is counted.
- ``trace``: context manager around ``jax.profiler`` for XLA-level traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


class BlockTimer:
    def __init__(self, capacity: int = 100_000):
        self._samples = []
        self._capacity = capacity

    @contextlib.contextmanager
    def measure(self, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            import jax

            jax.block_until_ready(result)
        if len(self._samples) < self._capacity:
            self._samples.append(time.perf_counter() - t0)

    def add(self, seconds: float) -> None:
        if len(self._samples) < self._capacity:
            self._samples.append(seconds)

    @property
    def count(self) -> int:
        return len(self._samples)

    def percentiles(self, qs=(50, 95, 99)):
        if not self._samples:
            return {q: float("nan") for q in qs}
        arr = np.asarray(self._samples)
        return {q: float(np.percentile(arr, q)) for q in qs}

    def summary(self) -> str:
        p = self.percentiles()
        return (f"{self.count} blocks: p50 {p[50]*1e3:.3f} ms, "
                f"p95 {p[95]*1e3:.3f} ms, p99 {p[99]*1e3:.3f} ms")

    def reset(self) -> None:
        self._samples = []


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Profiling / tracing subsystem.

The reference has none (SURVEY.md §5: only wall-clock reg_time). Here
tracing is first-class: `jax.profiler` trace capture around any code block,
named-scope annotation helpers for the compiled graphs, and a lightweight
step timer that reports device-synchronized wall times.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up in profiler traces around jitted code."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Device-synchronized wall-clock timing with warmup discard."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._count = 0

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        dt = time.perf_counter() - t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def summary(self) -> dict:
        if not self.times:
            return {"mean_s": 0.0, "min_s": 0.0, "count": 0}
        return {"mean_s": self.mean(), "min_s": min(self.times),
                "count": len(self.times)}

"""Profiling helpers: jax.profiler traces + lightweight step timing.

The reference has no first-party tracing (SURVEY.md §5); this provides
the TPU-native equivalent: a context manager around `jax.profiler` for
TensorBoard-viewable device traces, and a StepTimer for cheap host-side
throughput numbers (used by the trainer's `profile_dir` hook and by
benchmark scripts).
"""

from __future__ import annotations

import contextlib
import time
from collections.abc import Iterator


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (open in TensorBoard's profile tab)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-rate tracker: `timer.tick()` per step, `.summary()`."""

    def __init__(self, window: int = 100) -> None:
        self.window = window
        self._times: list[float] = []
        self._count = 0

    def tick(self) -> None:
        self._count += 1
        self._times.append(time.perf_counter())
        if len(self._times) > self.window:
            self._times.pop(0)

    @property
    def steps_per_second(self) -> float:
        if len(self._times) < 2:
            return 0.0
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / max(span, 1e-9)

    def summary(self) -> dict[str, float]:
        return {
            "steps": float(self._count),
            "steps_per_second": self.steps_per_second,
        }

"""Tracing/profiling: jax.profiler capture + lightweight step timing.

The reference's only tracing is Lightning's `profiler="simple"`
(/root/reference/train.py:91). TPU equivalent: `jax.profiler` traces that
open in TensorBoard/XProf, plus an in-process `StepTimer` that feeds the
rays/sec numbers in the trainer's JSONL metrics log.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into `log_dir` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Windowed steps/sec + rays/sec tracker."""

    def __init__(self, rays_per_step: int):
        self.rays_per_step = rays_per_step
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    @property
    def rays_per_sec(self) -> float:
        return self.steps_per_sec * self.rays_per_step

    def window(self) -> dict:
        """Snapshot + reset; returns {'steps_per_sec', 'rays_per_sec'}."""
        out = {"steps_per_sec": self.steps_per_sec,
               "rays_per_sec": self.rays_per_sec}
        self.reset()
        return out

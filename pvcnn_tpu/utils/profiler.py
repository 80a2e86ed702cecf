"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md §5.1 — tensorboard scalars only).
Here: a `jax.profiler` trace capture helper (produces TensorBoard/XPlane traces
viewable in Perfetto) plus a points/sec throughput meter — points/sec/chip is this
framework's north-star performance metric.

Usage:
    with trace_if("runs/x/profile", enabled=step < 5):
        state, loss = train_step(...)

    meter = ThroughputMeter()
    meter.tick(points=batch * num_points)
    print(meter.points_per_sec())
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "trace_if", "ThroughputMeter"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device+host trace into `log_dir` (TensorBoard-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def trace_if(log_dir: str, enabled: bool):
    if not enabled:
        yield
        return
    with trace(log_dir):
        yield


class ThroughputMeter:
    """Sliding-window points/sec counter; call tick() once per completed step."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events: list[tuple[float, int]] = []

    def tick(self, points: int):
        now = time.perf_counter()
        self._events.append((now, points))
        if len(self._events) > self.window:
            self._events.pop(0)

    def points_per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        pts = sum(p for _, p in self._events[1:])
        return pts / dt if dt > 0 else 0.0

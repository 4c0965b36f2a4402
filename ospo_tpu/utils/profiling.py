"""Tracing / profiling utilities.

The reference has no profiling beyond wall-clock prints (SURVEY §5).  Here:
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (set ``OSPO_TRACE_DIR`` or pass a path);
- :class:`ThroughputMeter` — rolling tokens/sec / samples/sec counters the
  engines and trainer report through;
- :func:`annotate` — ``jax.profiler.TraceAnnotation`` passthrough for
  labelling host-side pipeline phases.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    log_dir = log_dir or os.environ.get("OSPO_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """Rolling throughput over a window of recent update() calls."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events = []  # (timestamp, units)
        self.total_units = 0.0

    def update(self, units: float) -> None:
        self.total_units += units
        self._events.append((time.time(), units))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def rate(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        units = sum(u for _, u in self._events[1:])
        return units / dt if dt > 0 else 0.0

    def summary(self, unit: str = "items") -> Dict[str, float]:
        return {f"{unit}_total": self.total_units, f"{unit}_per_sec": self.rate}

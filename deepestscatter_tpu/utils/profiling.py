"""Profiling and observability hooks.

The reference's only instrumentation is wall-clock prints (MS/FRAME,
GuiExecutionLoop.cpp:116-121; MS/Render, RadianceCollector.cpp:87-97 —
SURVEY.md §5.1).  Here the same role is filled by:

- ``trace`` — context manager around ``jax.profiler`` (XLA device traces,
  viewable in TensorBoard/Perfetto);
- ``Throughput`` — rays/s / samples/s counters with wall-clock timing;
- ``annotate`` — named TraceAnnotation regions that show up in device
  profiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA device trace (open with TensorBoard's profile tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the device trace."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Counter for rays/samples per second.

    >>> t = Throughput("rays")
    >>> with t.measure(n_items=512*256*10):
    ...     tick()
    >>> t.report()
    """

    def __init__(self, unit: str = "items"):
        self.unit = unit
        self.total_items = 0
        self.total_seconds = 0.0
        self.calls = 0

    @contextlib.contextmanager
    def measure(self, n_items: int) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total_items += n_items
            self.total_seconds += dt
            self.calls += 1

    @property
    def per_second(self) -> float:
        return self.total_items / self.total_seconds if self.total_seconds else 0.0

    def report(self) -> str:
        return (
            f"{self.total_items:,} {self.unit} in {self.total_seconds:.2f}s "
            f"over {self.calls} calls = {self.per_second / 1e6:.3f} M{self.unit}/s"
        )

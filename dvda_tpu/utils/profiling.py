"""Tracing & profiling — the observability subsystem.

The reference has no instrumentation beyond a per-byte callback usable as
a byte counter (SURVEY §5: bitstream.h:350-375, bitstream.c:3982).  The
rebuild provides:

* :class:`StageTimer` — wall-clock accounting per pipeline stage (parse,
  assembly, device, transfers), used by bench.py and exposed on decoders;
* :func:`trace` — a context manager emitting to the JAX profiler when a
  capture is active (``jax.profiler.TraceAnnotation``), so device kernels
  show up named in TensorBoard/Perfetto traces;
* :class:`ByteCounter` — the reference's byte-accounting callback analog
  for host-side stream taps.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

__all__ = ["StageTimer", "trace", "ByteCounter", "global_timer"]


class StageTimer:
    """Accumulates wall-clock per named stage; printable summary."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def add(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()

    def summary(self) -> str:
        if not self.totals:
            return "(no stages recorded)"
        width = max(len(k) for k in self.totals)
        lines = [
            f"{k:<{width}}  {v * 1000:9.1f} ms  ×{self.counts[k]}"
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)


#: process-wide timer used by the decoders when none is injected
global_timer = StageTimer()


@contextlib.contextmanager
def trace(name: str):
    """Annotate a region for the JAX profiler (no-op without a capture)."""
    try:
        import jax.profiler

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


class ByteCounter:
    """Counts bytes flowing through a host-side tap (reference analog:
    byte_counter, bitstream.c:3982)."""

    def __init__(self):
        self.count = 0

    def __call__(self, data) -> None:
        self.count += len(data)

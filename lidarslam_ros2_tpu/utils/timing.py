"""Structured per-stage timing + profiling hooks.

The reference's only tracing is an ad-hoc wall clock around ``align()``
printed under ``debug_flag`` (scanmatcher_component.cpp:351-354,370-371).
Here every pipeline stage can record into a shared :class:`StageTimer`, and
``trace()`` wraps ``jax.profiler`` so hot sections show up in TensorBoard /
Perfetto traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulates wall-clock stats per named stage."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.maxes: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.maxes[name] = max(self.maxes[name], dt)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 6),
                "count": self.counts[name],
                "mean_ms": round(1000.0 * self.totals[name] / max(self.counts[name], 1), 3),
                "max_ms": round(1000.0 * self.maxes[name], 3),
            }
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
        self.maxes.clear()


@contextlib.contextmanager
def trace(name: str):
    """Annotate a section for the JAX profiler (no-op overhead when no
    profiling session is active)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile(logdir: Optional[str] = None):
    """Capture a device profile around a block:

        with profile("/tmp/jax-trace"):
            engine.process_scan(...)
    """
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

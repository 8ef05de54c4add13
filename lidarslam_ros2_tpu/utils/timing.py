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
    """Accumulates wall-clock stats (incl. p50/p99) per named stage.

    Samples are kept per stage (bounded by ``max_samples``, oldest dropped)
    so percentiles reflect the tail the pipeline actually produced — a
    keyframe-scan stall shows up in ``p99`` even when the mean looks fine.
    """

    def __init__(self, max_samples: int = 100_000) -> None:
        self.samples: Dict[str, list] = defaultdict(list)
        self.counts: Dict[str, int] = defaultdict(int)
        self.totals: Dict[str, float] = defaultdict(float)  # ALL samples
        self.max_samples = max_samples

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            buf = self.samples[name]
            buf.append(dt)
            if len(buf) > self.max_samples:
                del buf[: len(buf) - self.max_samples]
            self.counts[name] += 1
            self.totals[name] += dt

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        out = {}
        for name in sorted(self.samples):
            s = np.asarray(self.samples[name])
            if s.size == 0:
                continue
            n = self.counts[name]
            # totals/mean cover ALL samples; percentiles cover the newest
            # max_samples window (consistent even after trimming)
            out[name] = {
                "count": n,
                "total_s": round(self.totals[name], 6),
                "mean_ms": round(1000.0 * self.totals[name] / max(n, 1), 3),
                "p50_ms": round(1000.0 * float(np.percentile(s, 50)), 3),
                "p99_ms": round(1000.0 * float(np.percentile(s, 99)), 3),
                "max_ms": round(1000.0 * float(s.max()), 3),
            }
        return out

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)

    def reset(self) -> None:
        self.samples.clear()
        self.counts.clear()
        self.totals.clear()


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

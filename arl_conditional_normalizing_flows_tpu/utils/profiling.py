"""Tracing / profiling utilities.

The reference has NO performance instrumentation — just commented-out
@tf.function decorations noting 'inconsistent speedups'
(conv_cINN_make_model.py:50-52; SURVEY.md §5).  Here: jax.profiler traces
(viewable in XProf/TensorBoard), named trace annotations for the hot regions,
and a lightweight step timer with wall/percentile summaries.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (jax.profiler.TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device profile into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class step_timer:
    """Collects per-step wall times; ``summary()`` gives mean/p50/p95."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        return {
            "n": len(ts),
            "mean_s": statistics.fmean(ts),
            "p50_s": ts[len(ts) // 2],
            # nearest-rank p95: ceil(0.95*n) - 1 (int(n*0.95) is one rank
            # high and returns the MAX for n <= 20)
            "p95_s": ts[max(0, -(-len(ts) * 95 // 100) - 1)],
            "total_s": sum(ts),
        }

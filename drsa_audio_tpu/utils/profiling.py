"""Tracing and per-phase timing.

The reference has no profiling beyond tqdm bars (SURVEY.md §5.1). Here:
``phase_timer`` wall-clock blocks with a summary table, and ``trace``
wraps ``jax.profiler.trace`` so any pipeline can emit a TensorBoard-viewable
XLA trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = [f"{'phase':24s} {'calls':>6s} {'total_s':>10s} {'mean_ms':>10s}"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {n:6d} {total:10.3f} {total / n * 1e3:10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA device trace context (view with TensorBoard's profile plugin)."""
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace."""
    with jax.profiler.TraceAnnotation(name):
        yield

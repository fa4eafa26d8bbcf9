"""Profiling / tracing hooks (SURVEY.md §5: the reference has none — only
wall-clock FPS prints). We expose jax.profiler trace capture around training
iterations plus simple phase timers."""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_trace(log_dir: str) -> None:
    """Non-contextmanager form for use across loop iterations (runner
    ``profile_trace_dir`` flag)."""
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per phase; ``timings()`` returns averages."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def timings(self):
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

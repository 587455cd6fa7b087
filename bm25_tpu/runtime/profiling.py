"""Tracing & profiling hooks.

TPU-native counterpart of the reference's observability set (SURVEY.md
section 5): per-op ``Trace[TraceLevel.OP]`` spans
(``/root/reference/operations/gather_scatter.mojo:631``) become
``jax.named_scope``/``jax.profiler.TraceAnnotation``; the offline
``rocprof-compute`` flow (``/root/reference/profile_amd.sh``) becomes a
Perfetto/XPlane trace capture usable with ``xprof``/TensorBoard.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field

import jax


def op_span(name: str):
    """Named trace span for compiled regions (in-graph annotation)."""
    return jax.named_scope(name)


def host_span(name: str):
    """Named trace span for host-side phases (shows up in profiler traces)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def capture_trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a device+host profile into ``log_dir`` (Perfetto/XPlane).

    Usage:
        with capture_trace("/tmp/bm25_trace"):
            engine.search(queries, top_k=1000)
    Inspect with TensorBoard's profile plugin or xprof.
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Wall-clock step timer collecting simple latency stats (p50/p99)."""

    samples_s: list = field(default_factory=list)

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.samples_s.append(time.perf_counter() - t0)

    def percentile(self, p: float) -> float:
        if not self.samples_s:
            return float("nan")
        xs = sorted(self.samples_s)
        idx = min(int(round(p / 100 * (len(xs) - 1))), len(xs) - 1)
        return xs[idx]

    def summary(self) -> dict:
        return {
            "count": len(self.samples_s),
            "p50_ms": self.percentile(50) * 1e3,
            "p99_ms": self.percentile(99) * 1e3,
            "mean_ms": (sum(self.samples_s) / len(self.samples_s) * 1e3)
            if self.samples_s
            else float("nan"),
        }

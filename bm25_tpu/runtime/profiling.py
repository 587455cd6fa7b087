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


@contextlib.contextmanager
def compile_phase_collector():
    """Collect JAX compile-phase durations inside the with-block.

    Yields a dict that accumulates, in seconds: ``jaxpr_trace_s`` (host
    tracing), ``lower_to_mlir_s`` (host lowering), ``backend_compile_s``
    (the PJRT compile call — through a remote-compile relay this is relay
    round-trip + remote XLA compile), and ``cache_retrieval_s``
    (persistent-cache reads).  The caller's wall time minus these is
    execution + host overhead + data transfers.  Built for the serve
    warmup breakdown (NOTES r4: 312-689 s cross-process first-warmup
    variance needed attribution — compile vs relay wait).

    Uses ``jax._src.monitoring`` listeners; the event names are the
    long-stable ``/jax/core/compile/*`` set (jax 0.9, dispatch.py:60-62).
    """
    from jax._src import monitoring

    names = {
        "/jax/core/compile/jaxpr_trace_duration": "jaxpr_trace_s",
        "/jax/core/compile/jaxpr_to_mlir_module_duration": "lower_to_mlir_s",
        "/jax/core/compile/backend_compile_duration": "backend_compile_s",
        "/jax/compilation_cache/cache_retrieval_time_sec":
            "cache_retrieval_s",
    }
    events = {v: 0.0 for v in names.values()}

    def _cb(event: str, duration: float, **kw) -> None:
        key = names.get(event)
        if key is not None:
            events[key] += duration

    monitoring.register_event_duration_secs_listener(_cb)
    try:
        yield events
    finally:
        monitoring.unregister_event_duration_listener(_cb)


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

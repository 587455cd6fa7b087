"""Device/engine health checks — serving-side failure detection.

The reference has no failure detection (SURVEY.md section 5: errors raise
eagerly, single-process lifetime).  A serving deployment needs liveness
probes: ``device_probe`` executes a small known computation on the
accelerator and verifies the numeric result (catching wedged devices or a
dead tunnel), ``engine_probe`` runs a fixed query through the full engine
path and checks the invariants that hold for any index (sorted scores,
in-range doc ids).  serve.py exposes both through /healthz?deep=1.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np


@dataclass
class ProbeResult:
    ok: bool
    latency_ms: float
    detail: str = ""

    def as_dict(self) -> dict:
        return {"ok": self.ok, "latency_ms": round(self.latency_ms, 2),
                "detail": self.detail}


def device_probe(device=None) -> ProbeResult:
    """Run a tiny matmul on the device and verify the result numerically."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    try:
        a = jnp.full((8, 128), 2.0)
        b = jnp.full((128, 128), 3.0)
        if device is not None:
            a = jax.device_put(a, device)
            b = jax.device_put(b, device)
        out = float(jnp.dot(a, b, preferred_element_type=jnp.float32)[0, 0])
        ok = abs(out - 2.0 * 3.0 * 128) < 1e-3
        return ProbeResult(ok=ok, latency_ms=(time.perf_counter() - t0) * 1e3,
                           detail="" if ok else f"bad result {out}")
    except Exception as e:  # noqa: BLE001 - a probe must not raise
        return ProbeResult(ok=False, latency_ms=(time.perf_counter() - t0) * 1e3,
                           detail=f"{type(e).__name__}: {e}")


def engine_probe(engine, num_tokens: int = 2) -> ProbeResult:
    """Run one fixed query through the engine; check structural invariants."""
    t0 = time.perf_counter()
    try:
        ids = np.zeros((1, num_tokens), dtype=np.int32)
        docs, scores = engine.search(ids, top_k=min(3, engine.num_docs))
        ok = (
            docs.shape == scores.shape
            and (np.diff(scores[0]) <= 1e-6).all()  # sorted descending
            and int(docs.max(initial=0)) < engine.num_docs
            and int(docs.min(initial=0)) >= 0
            and np.isfinite(scores).all()
        )
        return ProbeResult(ok=bool(ok), latency_ms=(time.perf_counter() - t0) * 1e3,
                           detail="" if ok else "invariant violation")
    except Exception as e:  # noqa: BLE001
        return ProbeResult(ok=False, latency_ms=(time.perf_counter() - t0) * 1e3,
                           detail=f"{type(e).__name__}: {e}")

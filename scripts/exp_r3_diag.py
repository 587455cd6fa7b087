"""Diagnose the ~15 ms step regression: device-built hot arrays vs
host-round-tripped, plus memory_stats / chunk-plan checks."""
import time

import jax
import numpy as np

from bm25_tpu.bench.query_bench import (BenchConfig, make_queries,
                                        make_synthetic_index,
                                        measure_device_step_ms)
from bm25_tpu.models.sparse import SparseEngine, device_hbm_bytes


def main():
    d = jax.devices()[0]
    try:
        stats = d.memory_stats()
        print("[diag] memory_stats bytes_limit:",
              stats.get("bytes_limit") if stats else None)
    except Exception as e:
        print("[diag] memory_stats error:", e)
    print("[diag] device_hbm_bytes:", device_hbm_bytes() / 2**30, "GiB")

    cfg = BenchConfig.from_env()
    index = make_synthetic_index(cfg)
    engine = SparseEngine.from_scored_index(index, max_buckets=cfg.max_buckets)
    print(f"[diag] budget={engine.score_buffer_budget/2**30:.2f} GiB "
          f"hot_h={engine.hot_h}")
    queries = make_queries(cfg)[: cfg.batch]
    perm, chunks = engine.plan_chunks(queries.astype(np.int32))
    print(f"[diag] chunk plan: {[c[1].shape for c in chunks]} "
          f"cold={[None if c[3] is None else c[3].shape for c in chunks]}")
    for b in engine.buckets:
        if "hotT" in b:
            print("[diag] hotT fmt:", b["hotT"].shape, b["hotT"].dtype,
                  getattr(b["hotT"], "format", None))
    ms = measure_device_step_ms(engine, queries, 1000)
    print(f"[diag] device-built hot: k=1000 step={ms:.2f} ms")
    ms = measure_device_step_ms(engine, queries, 100)
    print(f"[diag] device-built hot: k=100  step={ms:.2f} ms")

    # round-trip the hot arrays through host + device_put (the round-2
    # layout) and re-measure
    for b in engine.buckets:
        if "hotT" in b:
            b["hotT"] = engine.session.put(np.asarray(b["hotT"]))
            b["hotLo"] = engine.session.put(np.asarray(b["hotLo"]))
    ms = measure_device_step_ms(engine, queries, 1000)
    print(f"[diag] host-roundtrip hot: k=1000 step={ms:.2f} ms")
    ms = measure_device_step_ms(engine, queries, 100)
    print(f"[diag] host-roundtrip hot: k=100  step={ms:.2f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""E2e bench-scale measurement after the round-2 transfer fixes."""

import os
import time

import numpy as np


def main():
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bm25_tpu.bench.query_bench import (
        BenchConfig, make_queries, make_synthetic_index, recall_at_k)
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.reference import ReferenceEngine

    cfg = BenchConfig()
    index = make_synthetic_index(cfg)
    queries = make_queries(cfg)
    ref = ReferenceEngine.from_scored_index(index)
    nb = 32
    print("[exp] index ready", flush=True)

    for sdt in ("float32", "bfloat16"):
        eng = SparseEngine.from_scored_index(index, score_dtype=sdt)
        for k in (100, 1000):
            rd, rs = ref.search(queries[:nb], top_k=k)
            eng.search(queries[:512], top_k=k)  # warm/compile
            lats = []
            for _ in range(3):
                t0 = time.perf_counter()
                eng.search(queries[:512], top_k=k)
                lats.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            dd, ss = eng.search(queries, top_k=k)
            qps = len(queries) / (time.perf_counter() - t0)
            rec = recall_at_k(dd[:nb], rd)
            err = float(np.max(np.abs(ss[:nb] - rs)))
            print(f"[exp] {sdt} k={k}: batch_lat={min(lats)*1e3:.1f}ms "
                  f"qps={qps:.0f} recall={rec:.4f} max_err={err:.2e}",
                  flush=True)
        del eng
    print("done", flush=True)


if __name__ == "__main__":
    main()

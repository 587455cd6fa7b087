"""A/B the cold-width query routing at the bench shape (on-chip).

With h=1024 hot tokens, ~2/3 of Zipf query tokens are hot; their scan
compares can never match (hot postings left the ELL), yet cost O(T) VPU
ops per slot.  Routing strips hot ids from the kernel operand and sorts
queries by cold count so most chunks compile at T_c in {2, 4} instead
of 8.  Measures e2e qps + recall, routed vs unrouted.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import numpy as np

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
    print(f"[route] index ready nnz={index.nnz}", flush=True)
    eng = SparseEngine.from_scored_index(index, max_buckets=cfg.max_buckets)
    print(f"[route] hot_h={eng.hot_h}", flush=True)
    # cold-count distribution under the bench's Zipf queries
    hr = eng.hot_table_host[np.where(queries >= 0, queries, 0)]
    cold = ((queries >= 0) & (hr < 0)).sum(1)
    print(f"[route] cold tokens/query: mean={cold.mean():.2f} "
          f"p50={np.percentile(cold, 50):.0f} p95={np.percentile(cold, 95):.0f} "
          f"max={cold.max()}", flush=True)

    ref = ReferenceEngine.from_scored_index(index)
    nb = 32
    for k in (1000, 100):
        rd, _ = ref.search(queries[:nb], top_k=k)
        for routed in (False, True):
            eng.route_cold = routed
            dd, _ = eng.search(queries[: cfg.batch], top_k=k)  # warm/compile
            qps = 0.0
            for _ in range(2):
                t0 = time.perf_counter()
                eng.search(queries, top_k=k)
                qps = max(qps, len(queries) / (time.perf_counter() - t0))
            rec = recall_at_k(dd[:nb], rd)
            print(f"[route] k={k} routed={routed}: qps={qps:.0f} "
                  f"recall@{k}={rec:.4f}", flush=True)


if __name__ == "__main__":
    main()

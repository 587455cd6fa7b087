"""Bench-style routed device step with width-boundary chunking.

Comparable to BENCH_r02's device_step_ms (78.11 k=1000 / 41.7 k=100):
same engine config, same 2048-query routed plan methodology.
"""
import time

import numpy as np

from bm25_tpu.bench.query_bench import (BenchConfig, make_queries,
                                        make_synthetic_index,
                                        measure_device_step_ms)
from bm25_tpu.models.sparse import SparseEngine


def main():
    cfg = BenchConfig.from_env()
    index = make_synthetic_index(cfg)
    t0 = time.time()
    engine = SparseEngine.from_scored_index(index, max_buckets=cfg.max_buckets)
    print(f"[routed] upload+init {time.time()-t0:.1f}s hot_h={engine.hot_h}")
    queries = make_queries(cfg)  # FULL 2048: the bench's routed plan
    plan = engine.plan_chunks(queries.astype(np.int32))
    print(f"[routed] plan: {[(c[0], c[1].shape[0], None if c[3] is None else c[3].shape[1]) for c in plan[1]]}")
    for k in (cfg.top_k, cfg.top_k2):
        ms = measure_device_step_ms(engine, queries, k, plan=plan)
        print(f"[routed] k={k}: device_step={ms:.2f} ms (weighted mean over plan)")

    # recall sanity through the public search
    from bm25_tpu.reference import ReferenceEngine

    oracle = ReferenceEngine.from_scored_index(index)
    sub = queries[:64]
    dd, _ = engine.search(sub, top_k=1000)
    od, _ = oracle.search(sub, top_k=1000)
    rec = np.mean([len(np.intersect1d(dd[i], od[i])) / 1000 for i in range(64)])
    print(f"[routed] recall@1000: {rec:.4f}")


if __name__ == "__main__":
    main()

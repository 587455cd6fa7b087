#!/usr/bin/env python3
"""A/B experiment: tail-tier candidate generation vs pure ELL (round 2).

Runs the bench-scale synthetic corpus through SparseEngine with the tail
tier on and off, at k=100 and k=1000, and prints step timings + recall vs
the host oracle.  Usage: python scripts/exp_tail_ab.py [num_docs] [mode]
mode: both|tail|ell (default both).
"""

import gc
import os
import sys
import time

import numpy as np


def main():
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bm25_tpu.bench.query_bench import BenchConfig, make_queries, make_synthetic_index, recall_at_k
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.reference import ReferenceEngine

    num_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    cfg = BenchConfig(num_docs=num_docs)
    print(f"[exp] building index: {cfg.num_docs} docs", flush=True)
    t0 = time.perf_counter()
    index = make_synthetic_index(cfg)
    print(f"[exp] built in {time.perf_counter()-t0:.1f}s nnz={index.nnz}", flush=True)
    queries = make_queries(cfg)
    ref = ReferenceEngine.from_scored_index(index)
    nb = 32
    ref_results = {}
    for k in (100, 1000):
        ref_results[k] = ref.search(queries[:nb], top_k=k)

    variants = []
    if mode in ("both", "tail"):
        variants.append(("tail", dict(tail_cap=4096)))
    if mode in ("both", "ell"):
        variants.append(("ell", dict(tail_cap=0)))

    for name, kw in variants:
        t0 = time.perf_counter()
        eng = SparseEngine.from_scored_index(index, **kw)
        print(f"[exp] {name}: engine up in {time.perf_counter()-t0:.1f}s "
              f"hot_h={eng.hot_h} buckets={len(eng.buckets)} "
              f"mid_ell={any('tokT' in b for b in eng.buckets)} "
              f"tail_rows={0 if eng.tail_docs is None else eng.tail_docs.shape}",
              flush=True)
        from bm25_tpu.eval import index_memory_stats
        mem = index_memory_stats(index, eng)
        print(f"[exp] {name}: memory {mem.as_dict()}", flush=True)
        for k in (100, 1000):
            t0 = time.perf_counter()
            d0, s0 = eng.search(queries[:512], top_k=k)  # compile+warm
            print(f"[exp] {name} k={k}: first batch {time.perf_counter()-t0:.1f}s",
                  flush=True)
            # per-batch latency x3
            lats = []
            for i in range(3):
                t0 = time.perf_counter()
                eng.search(queries[:512], top_k=k)
                lats.append(time.perf_counter() - t0)
            # sustained: all 2048 queries in one pipelined call
            t0 = time.perf_counter()
            dd, ss = eng.search(queries, top_k=k)
            qps = len(queries) / (time.perf_counter() - t0)
            rec = recall_at_k(dd[:nb], ref_results[k][0])
            err = float(np.max(np.abs(ss[:nb] - ref_results[k][1])))
            print(f"[exp] {name} k={k}: batch_lat={min(lats)*1e3:.1f}ms "
                  f"qps={qps:.0f} recall@{k}={rec:.4f} max_err={err:.2e}",
                  flush=True)
        del eng
        gc.collect()
    print("[exp] done", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""MS MARCO-scale (8.84M docs, 311M postings) validation of engine defaults.

Re-run of the round-2 scale check with hot_tokens="auto": verifies the
cost model's memory cap keeps the resident index + transient buffers
inside HBM at a scale where an OOM kills the TPU worker, and records the
chosen hot size, memory, step time and oracle parity.
"""

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
        BenchConfig, make_queries, make_synthetic_index,
        measure_device_step_ms, recall_at_k)
    from bm25_tpu.eval import index_memory_stats
    from bm25_tpu.models.sparse import SparseEngine, choose_layout
    from bm25_tpu.reference import ReferenceEngine

    cfg = BenchConfig(num_docs=8_840_000, vocab=262144, avg_len=35,
                      num_queries=2048, query_len=8)
    t0 = time.perf_counter()
    index = make_synthetic_index(cfg)
    print(f"[mm] built in {time.perf_counter()-t0:.0f}s nnz={index.nnz}",
          flush=True)
    queries = make_queries(cfg)

    t0 = time.perf_counter()
    # bucket count + hot size from the calibrated cost model (VERDICT r2
    # item 3: no hand-set layout constants at scale)
    layout = choose_layout(index, k=1000, log=print)
    print(f"[mm] layout = {layout} (chose in {time.perf_counter()-t0:.0f}s)",
          flush=True)

    t0 = time.perf_counter()
    eng = SparseEngine.from_scored_index(
        index, max_buckets=layout["max_buckets"])
    print(f"[mm] engine up in {time.perf_counter()-t0:.0f}s hot_h={eng.hot_h} "
          f"buckets={len(eng.buckets)} "
          f"score_budget={eng.score_buffer_budget/2**30:.2f}GiB", flush=True)
    mem = index_memory_stats(index, eng)
    print(f"[mm] memory: {mem.as_dict()}", flush=True)

    for k in (100, 1000):
        eng.search(queries[:512], top_k=k)  # warm/compile
        t0 = time.perf_counter()
        dd, ss = eng.search(queries, top_k=k)
        dt = time.perf_counter() - t0
        # relay-proof hardware-side figure over the routed DP chunk plan
        step = measure_device_step_ms(eng, queries, k)
        hw_qps = 512e3 / step if step else float("nan")
        print(f"[mm] k={k}: e2e {len(queries)/dt:.0f} qps "
              f"({dt*1e3/(len(queries)/512):.0f} ms/512-batch); "
              f"device step {step:.0f} ms/512 -> {hw_qps:.0f} qps "
              f"hardware-side", flush=True)

    ref = ReferenceEngine.from_scored_index(index)
    nb = 16
    rd, rs = ref.search(queries[:nb], top_k=1000)
    dd, ss = eng.search(queries[:nb], top_k=1000)
    rec = recall_at_k(dd, rd)
    err = float(np.max(np.abs(ss - rs)))
    print(f"[mm] oracle parity: recall@1000={rec:.4f} max_err={err:.2e}",
          flush=True)
    assert rec >= 0.999, rec
    print("[mm] OK", flush=True)


if __name__ == "__main__":
    main()

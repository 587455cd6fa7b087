#!/usr/bin/env python3
"""20M-doc synthetic run through a single SparseEngine (VERDICT r1 item 6).

Exercises the >= 2^24 unpacked result path on real hardware with oracle
spot-parity.  Uses a short avg_len to keep the host build tractable.
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

    from bm25_tpu.bench.query_bench import BenchConfig, make_queries, make_synthetic_index, recall_at_k
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.reference import ReferenceEngine

    cfg = BenchConfig(num_docs=20_000_000, vocab=65536, avg_len=8,
                      num_queries=256, query_len=8)
    t0 = time.perf_counter()
    index = make_synthetic_index(cfg)
    print(f"[20m] built in {time.perf_counter()-t0:.0f}s nnz={index.nnz}",
          flush=True)
    queries = make_queries(cfg)

    t0 = time.perf_counter()
    eng = SparseEngine.from_scored_index(index)
    # 20M-row buckets: keep transient (Q, rows) score tiles + top-k temps
    # well inside HBM next to the ~3 GB resident index (a 4 GB budget
    # crashed the TPU worker at this scale — kernel-fault OOM)
    eng.score_buffer_budget = 1 << 30
    print(f"[20m] engine up in {time.perf_counter()-t0:.0f}s "
          f"hot_h={eng.hot_h} buckets={len(eng.buckets)} "
          f"pack={eng._pack_results}", flush=True)
    assert not eng._pack_results, "expected the unpacked (>2^24) result path"

    for k in (100, 1000):
        t0 = time.perf_counter()
        dd, ss = eng.search(queries, top_k=k)
        dt = time.perf_counter() - t0
        print(f"[20m] k={k}: {len(queries)/dt:.0f} qps", flush=True)
        assert dd.dtype == np.int32 and int(dd.max()) < cfg.num_docs

    # oracle spot-parity on a few queries
    ref = ReferenceEngine.from_scored_index(index)
    nb = 8
    rd, rs = ref.search(queries[:nb], top_k=100)
    dd, ss = eng.search(queries[:nb], top_k=100)
    rec = recall_at_k(dd, rd)
    err = float(np.max(np.abs(ss - rs)))
    print(f"[20m] oracle spot-parity: recall@100={rec:.4f} max_err={err:.2e}",
          flush=True)
    assert rec >= 0.999 and err < 1e-3
    print("[20m] OK", flush=True)


if __name__ == "__main__":
    main()

"""GROUP depth experiment (VERDICT r2 item 1's last named lever).

Measures the routed device step at the bench shape with the fused
epilogue's first-level maxima GROUP widened from 8 to 16/32 (deeper
in-kernel maxima = fewer groups for the selection tree, wider winner
groups for the candidate gather + final sort).  Finding 0's decomposition
predicts a wash-or-loss (the dominant cost is the per-index-latency
winner gather, whose index count Q*k is GROUP-independent, while the
final sort width k*GROUP doubles) — this script replaces that prediction
with a measurement.

Usage:  BM25_GROUP=16 python scripts/exp_group_depth.py
"""
import os
import time

import numpy as np

import sys

import bm25_tpu.ops.ell_score  # noqa: F401

# NB: `import bm25_tpu.ops.ell_score as es` resolves to the ell_score
# FUNCTION (the ops package __init__ shadows the submodule name) — go
# through sys.modules for the real module object
es = sys.modules["bm25_tpu.ops.ell_score"]

GROUP = int(os.environ.get("BM25_GROUP", "8"))
es.GROUP = GROUP  # must land before any kernel trace

from bm25_tpu.bench.query_bench import (BenchConfig, _time_step_chunk,
                                        make_queries, make_synthetic_index)
from bm25_tpu.models.sparse import SparseEngine, make_sparse_query_step


def main():
    cfg = BenchConfig.from_env()
    index = make_synthetic_index(cfg)
    t0 = time.time()
    engine = SparseEngine.from_scored_index(index, max_buckets=cfg.max_buckets)
    print(f"[g{GROUP}] upload+init {time.time()-t0:.1f}s "
          f"hot_h={engine.hot_h} buckets={len(engine.buckets)}")
    queries = make_queries(cfg)

    # recall sanity vs the oracle on the first 64 queries
    from bm25_tpu.reference import ReferenceEngine

    ref = ReferenceEngine.from_scored_index(index)
    rd, _ = ref.search(queries[:64], top_k=cfg.top_k)
    dd, _ = engine.search(queries[:64].astype(np.int32), top_k=cfg.top_k)
    rec = np.mean([
        len(set(map(int, dd[i])) & set(map(int, rd[i]))) / cfg.top_k
        for i in range(len(rd))
    ])
    print(f"[g{GROUP}] recall@{cfg.top_k} vs oracle (64q): {rec:.4f}")

    _, chunks = engine.plan_chunks(queries.astype(np.int32))
    for k in (cfg.top_k, cfg.top_k2):
        per_config = {}
        total = 0.0
        for cq, padded, _w, cold_padded, _wc in chunks:
            key = (padded.shape,
                   None if cold_padded is None else cold_padded.shape)
            if key not in per_config:
                step = make_sparse_query_step(
                    min(k, engine.num_docs), engine.hot_h, pack=True,
                    split_cold=cold_padded is not None,
                    union_select=engine.union_select,
                )
                ids_dev = engine.session.put(padded)
                cold_dev = (None if cold_padded is None
                            else engine.session.put(cold_padded))
                per_config[key] = _time_step_chunk(
                    engine, step, ids_dev, cold_dev, 5
                )
                print(f"[g{GROUP}] k={k} chunk q_pad={padded.shape[0]} "
                      f"T_c={None if cold_padded is None else cold_padded.shape[1]}"
                      f": {per_config[key]:.2f} ms")
            total += per_config[key]
        q_total = sum(c[0] for c in chunks)
        print(f"[g{GROUP}] k={k}: per-512 {total*512/q_total:.2f} ms")


if __name__ == "__main__":
    main()

"""Routed-step reconciliation: per-chunk times + honest normalization."""
import time

import numpy as np

from bm25_tpu.bench.query_bench import (BenchConfig, _time_step_chunk,
                                        make_queries, make_synthetic_index)
from bm25_tpu.models.sparse import SparseEngine, make_sparse_query_step


def main():
    cfg = BenchConfig.from_env()
    index = make_synthetic_index(cfg)
    t0 = time.time()
    engine = SparseEngine.from_scored_index(index, max_buckets=cfg.max_buckets)
    print(f"[r2] upload+init {time.time()-t0:.1f}s hot_h={engine.hot_h}")
    queries = make_queries(cfg)
    plan = engine.plan_chunks(queries.astype(np.int32))
    _, chunks = plan
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
                print(f"[r2] k={k} chunk q_pad={padded.shape[0]} "
                      f"T_c={None if cold_padded is None else cold_padded.shape[1]}"
                      f": {per_config[key]:.2f} ms")
            total += per_config[key]
        q_total = sum(c[0] for c in chunks)
        print(f"[r2] k={k}: total={total:.1f} ms for {q_total} queries "
              f"-> per-512 {total*512/q_total:.2f} ms")


if __name__ == "__main__":
    main()

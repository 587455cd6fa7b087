"""Step A/B round 2: restored per-bucket path vs union with/without cond.

Run: PYTHONPATH=. python scripts/exp_r3_union_step2.py
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
    print(f"[ab2] upload+init {time.time()-t0:.1f}s (hot h={engine.hot_h})")
    queries = make_queries(cfg)[: cfg.batch]
    for mode in (False, True, "unsafe"):
        engine.union_select = mode
        for k in (cfg.top_k, cfg.top_k2):
            ms = measure_device_step_ms(engine, queries, k)
            print(f"[ab2] union={mode!r:8} k={k}: device_step={ms:.2f} ms")


if __name__ == "__main__":
    main()

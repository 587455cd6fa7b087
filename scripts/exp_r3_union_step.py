"""Full-step A/B of union vs per-bucket selection at the bench shape.

Round-2's lesson (NOTES findings 7/12): selection microbenchmarks do not
predict in-step cost — measure the WHOLE device step.  This builds the
512K-doc bench engine (2-bucket layout, auto hot tier, cold routing) and
times the routed device step with union_select on/off at k=1000/100,
plus a recall check vs the oracle.

Run: PYTHONPATH=. python scripts/exp_r3_union_step.py
"""

import time

import numpy as np

from bm25_tpu.bench.query_bench import (BenchConfig, make_queries,
                                        make_synthetic_index,
                                        measure_device_step_ms)
from bm25_tpu.models.sparse import SparseEngine


def main():
    cfg = BenchConfig.from_env()
    print(f"[union-step] {cfg.num_docs} docs, vocab {cfg.vocab}, "
          f"max_buckets={cfg.max_buckets}")
    t0 = time.time()
    index = make_synthetic_index(cfg)
    print(f"[union-step] index built {time.time()-t0:.1f}s")
    t0 = time.time()
    engine = SparseEngine.from_scored_index(index, max_buckets=cfg.max_buckets)
    print(f"[union-step] engine upload+init {time.time()-t0:.1f}s "
          f"(hot h={engine.hot_h})")
    queries = make_queries(cfg)[: cfg.batch]

    for union in (True, False):
        engine.union_select = union
        for k in (cfg.top_k, cfg.top_k2):
            ms = measure_device_step_ms(engine, queries, k)
            print(f"[union-step] union={union} k={k}: "
                  f"device_step={ms:.2f} ms")

    # recall check with union on (the shipping default)
    engine.union_select = True
    from bm25_tpu.reference import ReferenceEngine

    oracle = ReferenceEngine.from_scored_index(index)
    sub = queries[:64]
    for k in (1000, 100):
        dd, _ = engine.search(sub, top_k=k)
        od, _ = oracle.search(sub, top_k=k)
        inter = np.mean([
            len(np.intersect1d(dd[i], od[i])) / k for i in range(len(sub))
        ])
        print(f"[union-step] recall@{k} vs oracle: {inter:.4f}")


if __name__ == "__main__":
    main()

"""Round-4 item 1: e2e/device-step gap — transfer-overlap experiments.

BENCH_r03: headline k=1000 e2e 3632 qps vs device-step-implied 6694 qps
(76.48 ms/512).  ~100 ms/batch is host+d2h.  This script measures, at the
bench shape, every candidate pipeline structure so the engine change is
driven by numbers:

  A. current search() over the full query set (dispatch-all + batched get)
  B. per-batch search() loop (the p50 path)
  C. double-buffered loop: dispatch batch i+1, then fetch batch i
     (copy_to_host_async started at dispatch time)
  D. C with score_dtype="bfloat16" (halves score bytes; ids stay int32)
  E. C with ids_only (rankings-only)
  F. raw d2h bandwidth with NO concurrent compute (the transfer ceiling)

Run on-chip: python scripts/exp_r4_pipeline.py
"""

from __future__ import annotations

import time

import jax
import numpy as np

from bm25_tpu.bench.query_bench import BenchConfig, make_queries, \
    make_synthetic_index
from bm25_tpu.models.sparse import SparseEngine, choose_layout

K = 1000
cfg = BenchConfig.from_env()


def main():
    print(f"[exp] building index {cfg.num_docs} docs vocab {cfg.vocab}")
    t0 = time.perf_counter()
    index = make_synthetic_index(cfg)
    print(f"[exp] built {time.perf_counter()-t0:.1f}s nnz={index.nnz}")
    queries = make_queries(cfg)
    layout = choose_layout(index, k=K, q=cfg.batch, t=max(cfg.query_len, 8))
    t0 = time.perf_counter()
    engine = SparseEngine.from_scored_index(
        index, max_buckets=layout["max_buckets"])
    print(f"[exp] engine up {time.perf_counter()-t0:.1f}s "
          f"hot_h={engine.hot_h}")

    batches = [queries[i:i + cfg.batch]
               for i in range(0, len(queries), cfg.batch)]

    def warm(ids_only=False):
        for b in batches:
            if ids_only:
                engine.search_ids(b, top_k=K)
            else:
                engine.search(b, top_k=K)

    def timed(label, fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        qps = len(queries) / best
        print(f"[exp] {label}: {best*1e3:.1f} ms total = {qps:.0f} qps")
        return qps

    # ---- A: current full-set search -----------------------------------
    warm()
    timed("A current search(all)", lambda: engine.search(queries, top_k=K))

    # ---- B: per-batch loop ---------------------------------------------
    def per_batch():
        for b in batches:
            engine.search(b, top_k=K)

    timed("B per-batch loop", per_batch)

    # ---- C: double-buffered dispatch/fetch ------------------------------
    def fetch(futs):
        return jax.device_get([r for _, r in futs])

    def dispatch(b, ids_only=False):
        perm, chunks = engine.plan_chunks(b, k=K)
        futs = []
        for cq, padded, wpadded, cold_padded, wc_padded in chunks:
            futs.append((cq, engine._query_chunk(
                padded, K, wpadded, ids_only=ids_only,
                cold_padded=cold_padded, wc_padded=wc_padded)))
        # start d2h as soon as compute finishes, without blocking
        for _, r in futs:
            for leaf in (r if isinstance(r, tuple) else (r,)):
                leaf.copy_to_host_async()
        return futs

    def pipelined(ids_only=False):
        pending = None
        for b in batches:
            futs = dispatch(b, ids_only)
            if pending is not None:
                fetch(pending)
            pending = futs
        fetch(pending)

    timed("C double-buffered f32", pipelined)

    # ---- D: bf16 scores --------------------------------------------------
    engine.score_dtype = "bfloat16"
    warm()
    timed("A' search(all) bf16", lambda: engine.search(queries, top_k=K))
    timed("D double-buffered bf16", pipelined)
    engine.score_dtype = "float32"

    # ---- E: ids-only pipelined ------------------------------------------
    warm(ids_only=True)
    timed("A'' search_ids(all)", lambda: engine.search_ids(queries, top_k=K))
    timed("E double-buffered ids-only", lambda: pipelined(ids_only=True))

    # ---- F: raw d2h ceiling ----------------------------------------------
    import jax.numpy as jnp
    nbytes = cfg.batch * K * 8  # one f32 batch result (scores+ids)
    arr = jax.jit(lambda: jnp.ones((nbytes // 4,), jnp.float32))()
    arr.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(arr)
    dt = (time.perf_counter() - t0) / 4
    print(f"[exp] F raw d2h {nbytes/1e6:.1f} MB in {dt*1e3:.1f} ms "
          f"= {nbytes/dt/1e6:.1f} MB/s")

    # concurrent: two arrays fetched together
    arrs = [jax.jit(lambda i=i: jnp.ones((nbytes // 4,), jnp.float32) + i)()
            for i in range(4)]
    jax.block_until_ready(arrs)
    t0 = time.perf_counter()
    jax.device_get(arrs)
    dt = time.perf_counter() - t0
    print(f"[exp] F' batched d2h 4x{nbytes/1e6:.1f} MB in {dt*1e3:.1f} ms "
          f"= {4*nbytes/dt/1e6:.1f} MB/s")


if __name__ == "__main__":
    main()

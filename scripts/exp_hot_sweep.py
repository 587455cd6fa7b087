"""Sweep the hot-tier size at the bench shape: is MXU offload under-used?

The engine splits tokens by DF into a dense hot matrix (scored on the MXU,
bf16 high+residual) and ELL postings (scored by the VPU compare-count
kernel).  Marginal cost model per hot token at the bench shape:

* hot cost: rows x 4 B of HBM per query tile (bf16 hi+lo), 4 tiles/batch
  -> ~10 us/token/batch at 819 GB/s, plus ~free MXU flops.
* scan saving: DF(rank h) ~ nnz/(h ln V) slots, each costing
  Q x (2T+2) VPU ops -> ~5.8/h ms per token at Q=512, T=8.

Break-even h ~ 600 on paper; the default budget (= CSC bytes) caps h near
100.  This script measures the real curve.  Run on the TPU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    from bm25_tpu.bench.query_bench import (
        BenchConfig,
        make_queries,
        make_synthetic_index,
        measure_device_step_ms,
    )
    from bm25_tpu.models.sparse import SparseEngine

    cfg = BenchConfig()
    print(f"[sweep] building index: {cfg.num_docs} docs, vocab {cfg.vocab}")
    t0 = time.perf_counter()
    index = make_synthetic_index(cfg)
    print(f"[sweep] built in {time.perf_counter() - t0:.1f}s nnz={index.nnz}")
    queries = make_queries(cfg)[: cfg.batch]

    df = index.df()
    order = np.argsort(-df, kind="stable")
    csum = np.cumsum(df[order])
    for h in (128, 256, 512, 1024, 2048):
        print(f"[sweep] top-{h} tokens own {csum[h-1]/index.nnz:.1%} of postings")

    results = []
    for h in (0, 128, 256, 512, 1024, 2048):
        t0 = time.perf_counter()
        eng = SparseEngine.from_scored_index(
            index, hot_tokens=h, hot_budget_bytes=8 << 30,
            max_buckets=cfg.max_buckets,
        )
        up = time.perf_counter() - t0
        slots = sum(
            int(np.prod(b["tokT"].shape)) for b in eng.buckets if "tokT" in b
        )
        row = {"h": eng.hot_h, "upload_s": round(up, 1), "ell_slots": slots}
        for k in (1000, 100):
            ms = measure_device_step_ms(eng, queries, k)
            row[f"step_ms_k{k}"] = round(ms, 1) if ms is not None else None
        results.append(row)
        print("[sweep]", row, flush=True)
        del eng

    print("\nh     ell_slots     k=1000 ms   k=100 ms   upload s")
    for r in results:
        print(
            f"{r['h']:<6}{r['ell_slots']:<14}{r['step_ms_k1000']:<12}"
            f"{r['step_ms_k100']:<11}{r['upload_s']}"
        )


if __name__ == "__main__":
    main()

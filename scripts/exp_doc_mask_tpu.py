"""On-chip validation + cost of filtered search (doc_mask).

The masked sparse path loses the fused kernel's in-kernel maxima (one
extra (Q, rows) max pass per bucket) — measure that cost at a mid-size
shape, and check masked results against the CPU oracle on hardware
(CPU tests run the Pallas kernel in interpret mode; result-packing
changes must be re-driven on the chip).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402


def main() -> None:
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    from bm25_tpu.bench.query_bench import (BenchConfig, make_synthetic_index,
                                            measure_device_step_ms)
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.reference import ReferenceEngine

    cfg = BenchConfig()
    cfg.num_docs = 262144
    cfg.num_queries = 256
    index = make_synthetic_index(cfg)
    oracle = ReferenceEngine.from_scored_index(index)
    eng = SparseEngine.from_scored_index(index)
    rng = np.random.default_rng(0)
    q = rng.integers(0, index.vocab_size, size=(256, 8)).astype(np.int32)
    mask = rng.random(index.num_docs) < 0.5

    for k in (100, 1000):
        dd, ds = eng.search(q, top_k=k, doc_mask=mask)
        od, os_ = oracle.search(q, top_k=k, doc_mask=mask)
        err = float(np.max(np.abs(ds - os_)))
        assert (dd >= 0).all() and mask[dd].all()
        misses = 0
        for i in range(len(q)):
            missing = set(od[i].tolist()) - set(dd[i].tolist())
            misses += len(missing)
            for m in missing:
                # any miss must be an FP tie at the k-th boundary (the
                # same 1e-5-class rounding the unmasked bench rounds away)
                om = float(os_[i][list(od[i]).index(m)])
                assert abs(om - float(ds[i][-1])) < 1e-4, (i, m, om, ds[i][-1])
        recall = 1.0 - misses / (len(q) * k)
        print(f"k={k}: masked recall vs oracle {recall:.6f} "
              f"({misses} boundary-tie misses), max |score err| {err:.2e}",
              flush=True)
        assert recall >= 0.9999

        # e2e cost: masked vs unmasked (same 256-query chunk, warmed)
        for label, kw in (("unmasked", {}), ("masked", {"doc_mask": mask})):
            eng.search(q, top_k=k, **kw)  # warm THIS chunk shape
            t0 = time.perf_counter()
            for _ in range(5):
                eng.search(q, top_k=k, **kw)
            dt = (time.perf_counter() - t0) / 5
            print(f"k={k} {label}: e2e {dt*1e3:7.1f} ms / 256 queries",
                  flush=True)
    # sparse allowlist (0.1% eligible) — the case over-fetch cannot serve
    tiny = np.zeros(index.num_docs, bool)
    tiny[rng.choice(index.num_docs, size=262, replace=False)] = True
    dd, ds = eng.search(q[:32], top_k=100, doc_mask=tiny)
    od, os_ = oracle.search(q[:32], top_k=100, doc_mask=tiny)
    np.testing.assert_array_equal(dd == -1, od == -1)
    real = dd >= 0
    assert tiny[dd[real]].all()
    inter = np.mean([
        len(set(dd[i][dd[i] >= 0].tolist()) & set(od[i][od[i] >= 0].tolist()))
        / max((od[i] >= 0).sum(), 1)
        for i in range(32)
    ])
    print(f"0.1% allowlist: recall {inter:.4f} (shortfall sentinels match)",
          flush=True)
    assert inter == 1.0
    print("OK", flush=True)


if __name__ == "__main__":
    main()

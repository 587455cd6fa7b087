"""Re-check the hot-tier optimum WITH cold-width routing active.

Routing cut the scan's per-slot cost ~2x, which halves each hot token's
scan saving and shifts the cost-model optimum down.  If h=512 matches
h=1024's routed step, the smaller tier wins on memory (1.2 vs 2.3 GB).
"""

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bm25_tpu.bench.query_bench import (
        BenchConfig, make_queries, make_synthetic_index,
        measure_device_step_ms)
    from bm25_tpu.models.sparse import SparseEngine

    cfg = BenchConfig()
    index = make_synthetic_index(cfg)
    queries = make_queries(cfg)
    hs = tuple(int(a) for a in sys.argv[1:]) or (512, 1024)
    for h in hs:
        eng = SparseEngine.from_scored_index(
            index, hot_tokens=h, hot_budget_bytes=12 << 30,
            max_buckets=cfg.max_buckets,
        )
        hot_gb = sum(
            (b["hotT"].nbytes + b["hotLo"].nbytes)
            for b in eng.buckets if "hotT" in b
        ) / 2**30
        row = {"h": eng.hot_h, "hot_gb": round(hot_gb, 2)}
        for k in (1000, 100):
            ms = measure_device_step_ms(eng, queries, k)
            row[f"step_k{k}"] = round(ms, 1)
        print("[hot-routed]", row, flush=True)
        del eng


if __name__ == "__main__":
    main()

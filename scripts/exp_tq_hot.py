"""Re-sweep the kernel query tile (BLOCK_Q) under the LARGE hot tier.

The original TQ sweep (128 optimal) ran at h~80 where hot matrices were
tiny; at h=1024 the hot bf16 pair re-streams once per query tile
(~8.4 GB/batch at TQ=128), so a larger tile halves hot HBM traffic at
some scan cost.  Measures the routed device step at TQ in {128, 256}.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import numpy as np

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bm25_tpu.ops.ell_score as ell
    from bm25_tpu.bench.query_bench import (
        BenchConfig, make_queries, make_synthetic_index,
        measure_device_step_ms)
    from bm25_tpu.models.sparse import SparseEngine

    cfg = BenchConfig()
    index = make_synthetic_index(cfg)
    queries = make_queries(cfg)
    eng = SparseEngine.from_scored_index(index, max_buckets=cfg.max_buckets)
    print(f"[tq] hot_h={eng.hot_h}", flush=True)
    for tq in (128, 256):
        ell.BLOCK_Q = tq
        eng.session._cache.clear()
        for k in (1000, 100):
            ms = measure_device_step_ms(eng, queries, k)
            print(f"[tq] BLOCK_Q={tq} k={k}: step {ms:.1f} ms", flush=True)
    ell.BLOCK_Q = 128


if __name__ == "__main__":
    main()

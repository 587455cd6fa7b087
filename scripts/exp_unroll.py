"""Sweep the ELL scan's loop unroll depth (UNROLL) on hardware.

Round 1 measured unroll=2 at 1.19x over 1 and a FULL unroll slower;
intermediate depths (4, 8) were never tried.  The scan is the dominant
cost at MS MARCO scale (~75% of the VPU elementwise ceiling), so even a
few percent here moves the headline.  Measures the routed device step at
the bench shape for UNROLL in {2, 4, 8}.
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

    import bm25_tpu.ops.ell_score as ell
    from bm25_tpu.bench.query_bench import (
        BenchConfig, make_queries, make_synthetic_index,
        measure_device_step_ms)
    from bm25_tpu.models.sparse import SparseEngine

    cfg = BenchConfig()
    index = make_synthetic_index(cfg)
    queries = make_queries(cfg)
    eng = SparseEngine.from_scored_index(index, max_buckets=cfg.max_buckets)
    print(f"[unroll] hot_h={eng.hot_h} "
          f"l_pads={[b['tokT'].shape[0] for b in eng.buckets if 'tokT' in b]}",
          flush=True)
    for u in (2, 4, 8):
        ell.UNROLL = u
        eng.session._cache.clear()
        for k in (1000, 100):
            ms = measure_device_step_ms(eng, queries, k)
            print(f"[unroll] UNROLL={u} k={k}: step {ms:.1f} ms", flush=True)
    ell.UNROLL = 2


if __name__ == "__main__":
    main()

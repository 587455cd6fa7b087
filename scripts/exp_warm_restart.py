"""Warm-restart timing at bench scale, on-chip.

Builds the 512K bench engine (host tokenize/score + upload), saves an
Orbax device checkpoint, then restores it via load_device_checkpoint —
no host index rebuild — and compares cold-build vs warm-restore wall
time plus result parity.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bm25_tpu.bench.query_bench import (
        BenchConfig, make_queries, make_synthetic_index)
    from bm25_tpu.index.device_checkpoint import (
        load_device_checkpoint, save_device_checkpoint)
    from bm25_tpu.models.sparse import SparseEngine

    cfg = BenchConfig()
    t0 = time.perf_counter()
    index = make_synthetic_index(cfg)
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng = SparseEngine.from_scored_index(index, max_buckets=cfg.max_buckets)
    up_s = time.perf_counter() - t0
    print(f"[warm] cold build: host {build_s:.0f}s + upload {up_s:.0f}s "
          f"hot_h={eng.hot_h}", flush=True)
    queries = make_queries(cfg)[:64]
    d0, s0 = eng.search(queries, top_k=50)

    with tempfile.TemporaryDirectory(dir="/root") as d:
        ckpt = os.path.join(d, "ckpt")
        t0 = time.perf_counter()
        save_device_checkpoint(ckpt, eng)
        save_s = time.perf_counter() - t0
        print(f"[warm] checkpoint saved in {save_s:.0f}s", flush=True)
        del eng
        t0 = time.perf_counter()
        eng2 = load_device_checkpoint(ckpt)
        load_s = time.perf_counter() - t0
        print(f"[warm] restored in {load_s:.0f}s "
              f"(vs {build_s + up_s:.0f}s cold) hot_h={eng2.hot_h}",
              flush=True)
        d1, s1 = eng2.search(queries, top_k=50)
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_allclose(s0, s1, rtol=1e-6, atol=1e-6)
        # routing survives the restore (host hot table re-derived)
        assert eng2.hot_table_host is not None
        print("[warm] parity OK, routing active after restore", flush=True)


if __name__ == "__main__":
    main()

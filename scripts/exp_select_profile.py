#!/usr/bin/env python3
"""Selection-path profiling: merge variants, tree top-k internals, k=1000."""

import os
import time

import numpy as np


def jax_block(x):
    import jax

    for l in jax.tree.leaves(x):
        np.asarray(jax.device_get(l[..., :1]))


def timeit(fn, *args, n=5):
    r = fn(*args)
    jax_block(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax_block(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    Q = 512

    # --- merge variants at (Q, 4000), k=1000 ---
    cs = jnp.asarray(rng.random((Q, 4000), dtype=np.float32))
    ci = jnp.asarray(rng.integers(0, 524288, (Q, 4000), dtype=np.int32))

    @jax.jit
    def merge_topk(cs, ci):
        ms, pos = lax.top_k(cs, 1000)
        return ms, jnp.take_along_axis(ci, pos, axis=1)

    @jax.jit
    def merge_sort2(cs, ci):
        nss, dd = lax.sort((-cs, ci), num_keys=2, is_stable=False)
        return -nss[:, :1000], dd[:, :1000]

    print(f"merge lax.top_k (512,4000) k=1000: {timeit(merge_topk, cs, ci)*1e3:.1f} ms", flush=True)
    print(f"merge 2-key sort (512,4000) k=1000: {timeit(merge_sort2, cs, ci)*1e3:.1f} ms", flush=True)

    # --- tree top-k at bucket sizes ---
    from bm25_tpu.ops.topk import top_k_tree

    for n in (131072, 524288):
        x = jnp.asarray(rng.random((Q, n), dtype=np.float32))
        for k in (100, 1000):
            f = jax.jit(lambda x, k=k: top_k_tree(x, k))
            print(f"tree (512,{n}) k={k}: {timeit(f, x)*1e3:.1f} ms", flush=True)

    # --- tree internals at (512, 524288), k=1000, branch 8 ---
    n, k, br = 524288, 1000, 8
    x = jnp.asarray(rng.random((Q, n), dtype=np.float32))

    @jax.jit
    def level_max(x):
        return jnp.max(x.reshape(Q, n // br, br), axis=-1)

    print(f"level-1 max reduce: {timeit(level_max, x)*1e3:.1f} ms", flush=True)
    maxes = jax.jit(level_max)(x)

    @jax.jit
    def level2_max(m):
        return jnp.max(m.reshape(Q, n // br // br, br), axis=-1)

    print(f"level-2 max reduce: {timeit(level2_max, maxes)*1e3:.1f} ms", flush=True)

    tg = jnp.asarray(
        np.sort(rng.integers(0, n // br, (Q, k), dtype=np.int32), axis=1)
    )

    @jax.jit
    def gather_groups(x, tg):
        groups = x.reshape(Q, n // br, br)
        return jnp.take_along_axis(groups, tg[:, :, None], axis=1)

    print(f"take_along_axis k groups (512,1000,8) from 65536: {timeit(gather_groups, x, tg)*1e3:.1f} ms", flush=True)

    @jax.jit
    def sort_merge(c):
        c2 = c.reshape(Q, k * br)
        iota = jnp.broadcast_to(jnp.arange(k * br, dtype=np.int32)[None], c2.shape)
        nv, ni = lax.sort((-c2, iota), num_keys=1, is_stable=True)
        return -nv[:, :k], ni[:, :k]

    cand = jax.jit(gather_groups)(x, tg)
    print(f"sort merge (512,8000)->k: {timeit(sort_merge, cand)*1e3:.1f} ms", flush=True)

    # --- fresh ELL engine k=1000: batch lat vs pipelined ---
    from bm25_tpu.bench.query_bench import BenchConfig, make_queries, make_synthetic_index
    from bm25_tpu.models.sparse import SparseEngine

    cfg = BenchConfig()
    index = make_synthetic_index(cfg)
    queries = make_queries(cfg)
    eng = SparseEngine.from_scored_index(index, tail_cap=0)
    for k in (100, 1000):
        eng.search(queries[:512], top_k=k)  # warm
        t0 = time.perf_counter()
        eng.search(queries[:512], top_k=k)
        lat = time.perf_counter() - t0
        t0 = time.perf_counter()
        eng.search(queries, top_k=k)
        qps = len(queries) / (time.perf_counter() - t0)
        print(f"ell fresh k={k}: batch_lat={lat*1e3:.1f}ms pipelined_qps={qps:.0f}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()

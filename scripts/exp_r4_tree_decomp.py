#!/usr/bin/env python3
"""Decompose top_k_tree_with_maxes at the bench bucket shape (k=1000).

Round-4 candidate 3 (NOTES.md) says the remaining single-chip headroom is
kernel-level inside selection.  Before building a Pallas primitive, find
which stage of the tree actually costs: the inner tree over the group
maxima, the winning-group gather, or the stable candidate sorts.

Shapes: Q=512 queries, one bucket of N=262144 padded rows (the 2-bucket
512K bench layout), branch=8, k=1000.  Relay-proof timing (chained
fori_loop, one fetch) as in exp_select_profile2.py.

Run: PYTHONPATH=. python scripts/exp_r4_tree_decomp.py
"""

import os
import time

import numpy as np

ITERS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bm25_tpu.ops.topk import (
        _sorted_topk,
        top_k_tree,
        top_k_tree_with_maxes,
    )

    rng = np.random.default_rng(0)
    Q, N, BR, K = 512, 262144, 8, 1000
    G = N // BR  # 32768 groups

    x2 = jnp.asarray(rng.random((Q, N), dtype=np.float32))
    maxes = jax.jit(
        lambda x: jnp.max(x.reshape(Q, G, BR), axis=-1)
    )(x2)
    maxes.block_until_ready()

    def dev_time(make_fn, args, label):
        def looped(n):
            @jax.jit
            def run(*a):
                def body(i, acc):
                    return acc * 0.5 + make_fn(*a, acc)

                return lax.fori_loop(0, n, body, jnp.float32(0))

            return run

        for n in (1, ITERS):
            float(looped(n)(*args))

        def t(f):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(*args))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, tn = t(looped(1)), t(looped(ITERS))
        per = max(tn - t1, 0.0) / (ITERS - 1) * 1e3
        print(f"{label}: {per:.2f} ms", flush=True)
        return per

    # 0. the whole thing
    def f_full(x2, maxes, acc):
        v, _ = top_k_tree_with_maxes(x2, maxes + acc * 0, K)
        return v[0, 0]

    dev_time(f_full, (x2, maxes), "FULL tree_with_maxes (512,262144) k=1000")

    # 1. inner tree over the group maxima (512, 32768)
    def f_inner(maxes, acc):
        v, _ = top_k_tree(maxes + acc * 0, K)
        return v[0, 0]

    dev_time(f_inner, (maxes,), "  inner tree over maxes (512,32768)")

    # 1a. the inner tree's own pieces: level-2 reduce, base sort, gather+sort
    def f_l2max(maxes, acc):
        m2 = jnp.max((maxes + acc * 0).reshape(Q, G // BR, BR), axis=-1)
        return m2[0, 0]

    dev_time(f_l2max, (maxes,), "    level-2 max reduce (512,32768)->(512,4096)")

    m2 = jax.jit(lambda m: jnp.max(m.reshape(Q, G // BR, BR), axis=-1))(maxes)
    m2.block_until_ready()

    def f_base_sort(m2, acc):
        v, _ = _sorted_topk(
            m2 + acc * 0,
            jnp.broadcast_to(
                lax.broadcasted_iota(jnp.int32, (1, G // BR), 1), m2.shape
            ),
            K,
        )
        return v[0, 0]

    dev_time(f_base_sort, (m2,), "    base stable sort (512,4096) -> k")

    tg = jnp.asarray(
        np.sort(rng.integers(0, G // BR, (Q, K), dtype=np.int32), axis=1)
    )

    def f_gather_sort_inner(maxes, acc):
        groups = (maxes + acc * 0).reshape(Q, G // BR, BR)
        cand = jnp.take_along_axis(groups, tg[:, :, None], axis=1)
        cand = cand.reshape(Q, K * BR)
        cand_idx = (
            tg[:, :, None] * BR + jnp.arange(BR)[None, None, :]
        ).reshape(Q, K * BR)
        v, _ = _sorted_topk(cand, cand_idx, K)
        return v[0, 0]

    dev_time(f_gather_sort_inner, (maxes,),
             "    gather 1000 grps x8 from (512,4096,8) + sort (512,8000)")

    # 2. outer gather from the full base + final sort
    tg2 = jnp.asarray(
        np.sort(rng.integers(0, G, (Q, K), dtype=np.int32), axis=1)
    )

    def f_gather_outer(x2, acc):
        groups = (x2 + acc * 0).reshape(Q, G, BR)
        cand = jnp.take_along_axis(groups, tg2[:, :, None], axis=1)
        return cand[0, 0, 0]

    dev_time(f_gather_outer, (x2,),
             "  outer gather 1000 grps x8 from (512,32768,8)")

    cand = jnp.asarray(rng.random((Q, K * BR), dtype=np.float32))
    cand_idx = jnp.asarray(
        rng.integers(0, N, (Q, K * BR), dtype=np.int32)
    )

    def f_final_sort(cand, acc):
        v, _ = _sorted_topk(cand + acc * 0, cand_idx, K)
        return v[0, 0]

    dev_time(f_final_sort, (cand,), "  final stable sort (512,8000) -> k")

    # 3. variants of the expensive sorts for comparison
    def f_sort_unstable(cand, acc):
        nv, ni = lax.sort((-(cand + acc * 0), cand_idx), num_keys=1,
                          is_stable=False)
        return -nv[0, 0]

    dev_time(f_sort_unstable, (cand,), "  final sort UNSTABLE 1-key (512,8000)")

    def f_sort_2key(cand, acc):
        nv, ni = lax.sort((-(cand + acc * 0), cand_idx), num_keys=2,
                          is_stable=False)
        return -nv[0, 0]

    dev_time(f_sort_2key, (cand,), "  final sort 2-key unstable (512,8000)")

    def f_lax_topk(cand, acc):
        v, p = lax.top_k(cand + acc * 0, K)
        return v[0, 0]

    dev_time(f_lax_topk, (cand,), "  lax.top_k (512,8000) k=1000")

    print("done", flush=True)


if __name__ == "__main__":
    main()

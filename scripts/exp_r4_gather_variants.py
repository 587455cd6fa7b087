#!/usr/bin/env python3
"""Gather-variant shootout for the tree's winning-group gather (k=1000).

exp_r4_tree_decomp.py showed the (512, k, 8) group gathers are ~15 of the
~18 ms per-bucket selection.  Candidates:

  A. take_along_axis on (Q, G, 8)            [current]
  B. flat row gather, width-8 rows           (Q*G, 8) table
  C. lane-aligned row gather: reshape to (Q*G/16, 128) rows (zero-copy,
     native tiling), gather each winner's super-row, in-register one-hot
     max over the 16 groups per row -> (Q, k, 8)
  D. C but with the final sort fused after it (the real consumer)

Run: PYTHONPATH=. python scripts/exp_r4_gather_variants.py
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

    rng = np.random.default_rng(0)
    Q, N, BR, K = 512, 262144, 8, 1000
    G = N // BR
    PER = 128 // BR  # groups per 128-lane row

    x2 = jnp.asarray(rng.random((Q, N), dtype=np.float32))
    tg = jnp.asarray(
        np.sort(rng.integers(0, G, (Q, K), dtype=np.int32), axis=1)
    )

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

    # A. current
    def f_a(x2, acc):
        groups = (x2 + acc * 0).reshape(Q, G, BR)
        cand = jnp.take_along_axis(groups, tg[:, :, None], axis=1)
        return cand[0, 0, 0]

    dev_time(f_a, (x2,), "A take_along_axis (Q,G,8)")

    # B. flat width-8 row gather
    flat8 = (jnp.arange(Q, dtype=jnp.int32)[:, None] * G + tg).reshape(-1)

    def f_b(x2, acc):
        tbl = (x2 + acc * 0).reshape(Q * G, BR)
        cand = jnp.take(tbl, flat8, axis=0)
        return cand[0, 0]

    dev_time(f_b, (x2,), "B flat row gather width-8")

    # C. lane-aligned 128-wide row gather + in-register select
    nrow = Q * N // 128
    rowof = (jnp.arange(Q, dtype=jnp.int32)[:, None] * (N // 128)
             + tg // PER)  # (Q, K)
    sub = tg % PER

    def f_c(x2, acc):
        tbl = (x2 + acc * 0).reshape(nrow, 128)
        rows = jnp.take(tbl, rowof.reshape(-1), axis=0)  # (Q*K, 128)
        rows4 = rows.reshape(Q, K, PER, BR)
        oh = (
            lax.broadcasted_iota(jnp.int32, (Q, K, PER), 2) == sub[:, :, None]
        )
        cand = jnp.max(
            jnp.where(oh[:, :, :, None], rows4, -jnp.inf), axis=2
        )  # (Q, K, BR)
        return cand[0, 0, 0]

    dev_time(f_c, (x2,), "C 128-lane row gather + one-hot max")

    # D. C + final 2-key sort (the real consumer path)
    def f_d(x2, acc):
        tbl = (x2 + acc * 0).reshape(nrow, 128)
        rows = jnp.take(tbl, rowof.reshape(-1), axis=0)
        rows4 = rows.reshape(Q, K, PER, BR)
        oh = (
            lax.broadcasted_iota(jnp.int32, (Q, K, PER), 2) == sub[:, :, None]
        )
        cand = jnp.max(
            jnp.where(oh[:, :, :, None], rows4, -jnp.inf), axis=2
        ).reshape(Q, K * BR)
        cand_idx = (
            tg[:, :, None] * BR + jnp.arange(BR)[None, None, :]
        ).reshape(Q, K * BR)
        nv, ni = lax.sort((-cand, cand_idx), num_keys=2, is_stable=False)
        return -nv[0, 0]

    dev_time(f_d, (x2,), "D = C + 2-key unstable sort -> k")

    # A + stable sort (the full current consumer path, for the same span)
    def f_a_full(x2, acc):
        groups = (x2 + acc * 0).reshape(Q, G, BR)
        cand = jnp.take_along_axis(groups, tg[:, :, None], axis=1)
        cand = cand.reshape(Q, K * BR)
        cand_idx = (
            tg[:, :, None] * BR + jnp.arange(BR)[None, None, :]
        ).reshape(Q, K * BR)
        nv, ni = lax.sort((-cand, cand_idx), num_keys=1, is_stable=True)
        return -nv[0, 0]

    dev_time(f_a_full, (x2,), "A + stable 1-key sort (current full)")

    print("done", flush=True)


if __name__ == "__main__":
    main()

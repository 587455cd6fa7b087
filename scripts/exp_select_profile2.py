#!/usr/bin/env python3
"""Relay-proof selection profiling: N dependency-chained iterations per fetch.

Each op runs inside a fori_loop whose carry feeds the next iteration, so
device time = (t(N) - t(1)) / (N - 1) with exactly one host fetch per call
— the ~30 ms axon relay round trip cancels out.
"""

import os
import time

import numpy as np

N_ITERS = 8


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

    def dev_time(make_fn, x, label):
        """make_fn(x, carry_scalar) -> scalar; loops it n times on device."""

        def looped(n):
            @jax.jit
            def run(x):
                def body(i, acc):
                    return acc * 0.5 + make_fn(x, acc)

                return lax.fori_loop(0, n, body, jnp.float32(0))

            return run

        for n in (1, N_ITERS):
            fn = looped(n)
            float(fn(x))  # compile + warm
        t1 = min(
            _t(looped(1), x) for _ in range(3)
        )
        tn = min(_t(looped(N_ITERS), x) for _ in range(3))
        per = (tn - t1) / (N_ITERS - 1)
        print(f"{label}: {per*1e3:.2f} ms/iter (t1={t1*1e3:.1f} tn={tn*1e3:.1f})",
              flush=True)
        return per

    def _t(fn, x):
        t0 = time.perf_counter()
        float(fn(x))
        return time.perf_counter() - t0

    from bm25_tpu.ops.topk import top_k_tree

    # selection
    for n, k in ((131072, 100), (131072, 1000), (524288, 100), (524288, 1000)):
        x = jnp.asarray(rng.random((Q, n), dtype=np.float32))

        def f(x, acc, k=k):
            v, i = top_k_tree(x + acc * 0, k)
            return v[0, 0]

        dev_time(f, x, f"tree (512,{n}) k={k}")

    # merge variants
    cs = jnp.asarray(rng.random((Q, 4000), dtype=np.float32))

    def f_topk(x, acc):
        v, p = lax.top_k(x + acc * 0, 1000)
        return v[0, 0]

    def f_sort2(x, acc):
        iota = jnp.broadcast_to(
            jnp.arange(x.shape[1], dtype=np.int32)[None], x.shape
        )
        nv, ii = lax.sort((-(x + acc * 0), iota), num_keys=2, is_stable=False)
        return -nv[0, 0]

    dev_time(f_topk, cs, "merge lax.top_k (512,4000) k=1000")
    dev_time(f_sort2, cs, "merge 2-key sort (512,4000) k=1000")

    # tree internals at (512, 524288) br=8
    n, br, k = 524288, 8, 1000
    x = jnp.asarray(rng.random((Q, n), dtype=np.float32))

    def f_max(x, acc):
        m = jnp.max((x + acc * 0).reshape(Q, n // br, br), axis=-1)
        return m[0, 0]

    dev_time(f_max, x, "level-1 max reduce (1GB)")

    tg = jnp.asarray(
        np.sort(rng.integers(0, n // br, (Q, k), dtype=np.int32), axis=1)
    )

    def f_gather(x, acc):
        groups = (x + acc * 0).reshape(Q, n // br, br)
        c = jnp.take_along_axis(groups, tg[:, :, None], axis=1)
        return c[0, 0, 0]

    dev_time(f_gather, x, "take_along_axis 1000 groups x8")

    # ELL kernel at bench bucket shape
    from bm25_tpu.ops.ell_score import ell_score

    rows, L, T = 131072, 48, 8
    tokT = jnp.asarray(rng.integers(0, 32768, (L, rows), dtype=np.int32))
    valT = jnp.asarray(rng.random((L, rows), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, 32768, (Q, T), dtype=np.int32))

    def f_ell(x, acc):
        s = ell_score(ids + (acc * 0).astype(jnp.int32), x, valT)
        return s[0, 0]

    dev_time(f_ell, tokT, f"ell_score (L={L}, rows={rows}) x1 bucket")

    # hot matmul
    hot = jnp.asarray(rng.random((80, 524288), dtype=np.float32).astype(jnp.bfloat16))
    cnts = jnp.asarray(rng.random((Q, 80), dtype=np.float32).astype(jnp.bfloat16))

    def f_mm(x, acc):
        s = jnp.dot(cnts + (acc * 0).astype(jnp.bfloat16), x,
                    preferred_element_type=jnp.float32)
        return s[0, 0]

    dev_time(f_mm, hot, "hot matmul (512,80)x(80,524288)")
    print("done", flush=True)


if __name__ == "__main__":
    main()

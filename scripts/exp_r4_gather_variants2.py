#!/usr/bin/env python3
"""Second gather shootout: sortedness hints, minor-axis gathers, k scaling.

exp_r4_gather_variants.py showed the winning-group gather is per-index
latency bound (~20 ns/index) in its current major-axis form.  Test:

  A2  take_along_axis with lax.gather(indices_are_sorted=True)
  E   minor-axis (lane-dim) gather: base pre-transposed to (Q, 8, G),
      take_along_axis on axis=2 — TPU can vectorize lane-dim selects
  E2  same but 2-D (Q*8, G) gather on axis=1
  F   k scaling of the current gather (latency model check)
  G   bf16 base gather (half the bytes; no-op if latency-bound)

Run: PYTHONPATH=. python scripts/exp_r4_gather_variants2.py
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

    # A2: explicit lax.gather, indices_are_sorted=True
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(0, 1),
        start_index_map=(0, 1),
    )
    qids = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[:, None], (Q, K))
    starts = jnp.stack([qids, tg], axis=-1)  # (Q, K, 2)

    def f_a2(x2, acc):
        groups = (x2 + acc * 0).reshape(Q, G, BR)
        cand = lax.gather(
            groups, starts, dnums, (1, 1, BR),
            indices_are_sorted=True, unique_indices=False,
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return cand[0, 0, 0]

    dev_time(f_a2, (x2,), "A2 lax.gather sorted+in_bounds (Q,K,8)")

    # E: minor-axis gather on pre-transposed base
    xt = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(x2).reshape(Q, G, BR).transpose(0, 2, 1)
        )
    )  # (Q, 8, G)

    def f_e(xt, acc):
        cand = jnp.take_along_axis(
            xt + acc * 0, tg[:, None, :], axis=2
        )  # (Q, 8, K)
        return cand[0, 0, 0]

    dev_time(f_e, (xt,), "E minor-axis take_along_axis (Q,8,G)->(Q,8,K)")

    # E2: 2-D minor-axis gather
    xt2 = xt.reshape(Q * BR, G)
    tg2 = jnp.repeat(tg, BR, axis=0)  # (Q*8, K)

    def f_e2(xt2, acc):
        cand = jnp.take_along_axis(xt2 + acc * 0, tg2, axis=1)
        return cand[0, 0]

    dev_time(f_e2, (xt2,), "E2 minor-axis take_along_axis (Q*8,G)->(Q*8,K)")

    # E3: minor-axis + the transpose cost (if base arrives untransposed)
    def f_e3(x2, acc):
        xt_ = (x2 + acc * 0).reshape(Q, G, BR).transpose(0, 2, 1)
        cand = jnp.take_along_axis(xt_, tg[:, None, :], axis=2)
        return cand[0, 0, 0]

    dev_time(f_e3, (x2,), "E3 transpose + minor-axis gather")

    # F: k scaling of the current formulation
    for k in (250, 500, 2000):
        tgk = jnp.asarray(
            np.sort(rng.integers(0, G, (Q, k), dtype=np.int32), axis=1)
        )

        def f_f(x2, acc, tgk=tgk):
            groups = (x2 + acc * 0).reshape(Q, G, BR)
            cand = jnp.take_along_axis(groups, tgk[:, :, None], axis=1)
            return cand[0, 0, 0]

        dev_time(f_f, (x2,), f"F take_along_axis k={k}")

    # G: bf16 base
    xb = x2.astype(jnp.bfloat16)

    def f_g(xb, acc):
        groups = (xb + acc.astype(jnp.bfloat16) * 0).reshape(Q, G, BR)
        cand = jnp.take_along_axis(groups, tg[:, :, None], axis=1)
        return cand[0, 0, 0].astype(jnp.float32)

    dev_time(f_g, (xb,), "G bf16 take_along_axis")

    print("done", flush=True)


if __name__ == "__main__":
    main()

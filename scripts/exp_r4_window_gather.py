#!/usr/bin/env python3
"""Prototype: windowed vreg-gather of sorted winner rows (Pallas TPU).

Mosaic's tpu.dynamic_gather works only within one 8-sublane vreg, but the
tree's winner rows are SORTED: 8 consecutive winners usually fall inside a
small row window (mean span 14 at k=1000 over 2048 rows).  Per 8-winner
output tile: load an 8-aligned dynamic window of W rows, gather within it
via W/8 vreg-level dynamic_gathers + a select chain, and fall back to 8
scalar row loads (predicated, rare) when the span exceeds the window.

Run: PYTHONPATH=. python scripts/exp_r4_window_gather.py
"""

import functools
import os
import time

import numpy as np

ITERS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    Q, N, BR, K = 512, 262144, 8, 1000
    G = N // BR
    R = N // 128  # 2048 super-rows/query
    PER = 128 // BR
    KP = 1024

    interpret = jax.devices()[0].platform != "tpu"

    x2 = jnp.asarray(rng.random((Q, N), dtype=np.float32))
    x3 = x2.reshape(Q, R, 128)
    tg = np.sort(
        np.stack([rng.choice(G, size=K, replace=False) for _ in range(Q)]),
        axis=1,
    ).astype(np.int32)
    rowof_np = np.full((Q, KP), 0, np.int32)
    rowof_np[:, :K] = tg // PER
    rowof_np[:, K:] = rowof_np[:, K - 1 : K]
    # (Q, 8, KP//8) winner layout: [q, s, t] = rowof[q, 8t+s]
    rows_v_np = rowof_np.reshape(Q, KP // 8, 8).transpose(0, 2, 1).copy()
    rows_v = jnp.asarray(rows_v_np)

    NT = KP // 8  # 128 output tiles

    def make(W):
        def kernel(rv_smem, rv_vmem, x_ref, out_ref):
            val = rv_vmem[0]  # (8, NT) int32
            for t in range(NT):
                w0 = rv_smem[0, 0, t]
                w7 = rv_smem[0, 7, t]
                w0a = jnp.minimum((w0 // 8) * 8, R - W)
                win = x_ref[0, pl.ds(w0a, W), :]  # (W, 128)
                rel = val[:, t : t + 1] - w0a  # (8, 1)
                relb = jnp.broadcast_to(rel, (8, 128))
                out_t = None
                for i in range(W // 8):
                    idx = jnp.clip(relb - 8 * i, 0, 7)
                    g = jnp.take_along_axis(win[8 * i : 8 * i + 8], idx, axis=0)
                    if out_t is None:
                        out_t = g
                    else:
                        out_t = jnp.where(relb // 8 == i, g, out_t)
                out_ref[0, 8 * t : 8 * t + 8, :] = out_t

                @pl.when(w7 - w0a >= W)
                def _(t=t, w0a=w0a):
                    for s in range(8):
                        r = rv_smem[0, s, t]
                        out_ref[0, 8 * t + s, :] = x_ref[0, r, :]

        @jax.jit
        def run(x3, rows_v):
            return pl.pallas_call(
                kernel,
                grid=(Q,),
                in_specs=[
                    pl.BlockSpec((1, 8, NT), lambda qi: (qi, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 8, NT), lambda qi: (qi, 0, 0)),
                    pl.BlockSpec((1, R, 128), lambda qi: (qi, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, KP, 128), lambda qi: (qi, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((Q, KP, 128), x3.dtype),
                interpret=interpret,
            )(rows_v, rows_v, x3)

        return run

    def dev_time(make_fn, args, label):
        def looped(n):
            @jax.jit
            def run(*a):
                def body(i, acc):
                    return acc * 0.5 + make_fn(*a, acc)

                return lax.fori_loop(0, n, body, jnp.float32(0))

            return run

        try:
            for n in (1, ITERS):
                float(looped(n)(*args))
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None

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

    ref = np.asarray(x3)[np.arange(Q)[:, None], rowof_np]
    for W in (32, 48):
        t0 = time.perf_counter()
        run = make(W)
        try:
            out = np.asarray(run(x3, rows_v))
        except Exception as e:  # noqa: BLE001
            print(f"W={W}: compile FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        print(f"W={W}: compile+run {time.perf_counter()-t0:.1f}s "
              f"correct={np.array_equal(out, ref)}", flush=True)

        def f(x3, rows_v, acc, run=run):
            o = run(x3 + acc * 0, rows_v)
            return o[0, 0, 0]

        dev_time(f, (x3, rows_v), f"windowed vreg gather W={W}")

    print("done", flush=True)


if __name__ == "__main__":
    main()

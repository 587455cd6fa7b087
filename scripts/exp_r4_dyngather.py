#!/usr/bin/env python3
"""Probe tpu.dynamic_gather (in-kernel take_along_axis) cost vs table height.

If Mosaic's sublane dynamic_gather is ~O(out tiles) it replaces the 7 ms
scalar-loop gather; if it decomposes into per-source-tile selects it will
blow up with table height.  Measure gathers of 1024 rows from (H, 128)
tables at H = 8..2048 per query.

Run: PYTHONPATH=. python scripts/exp_r4_dyngather.py
"""

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
    Q = 512
    KP = 1024

    interpret = jax.devices()[0].platform != "tpu"

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
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
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

    for H in (8, 32, 256, 2048):
        x3 = jnp.asarray(rng.random((Q, H, 128), dtype=np.float32))
        rowof_np = rng.integers(0, H, (Q, 1, KP)).astype(np.int32)
        rowof = jnp.asarray(rowof_np)

        def kernel(rows_ref, x_ref, out_ref, H=H):
            x = x_ref[0]  # (H, 128)
            rw = rows_ref[0]  # (1, KP)
            idx = jnp.broadcast_to(jnp.transpose(rw), (KP, 128))
            if H != KP:
                # take_along_axis needs idx rows == table rows: pad/slice
                if H > KP:
                    idx = jnp.pad(idx, ((0, H - KP), (0, 0)))
                else:
                    idx = idx[:H]
            got = jnp.take_along_axis(x, idx, axis=0)
            if H >= KP:
                out_ref[0] = got[:KP]
            else:
                # gather per H-block of the output
                for b in range(KP // H):
                    blk = jnp.broadcast_to(
                        jnp.transpose(rw[:, b * H:(b + 1) * H]), (H, 128)
                    )
                    out_ref[0, b * H:(b + 1) * H] = jnp.take_along_axis(
                        x, blk, axis=0
                    )

        @jax.jit
        def run(x3, rowof, kernel=kernel, H=H):
            return pl.pallas_call(
                kernel,
                grid=(Q,),
                in_specs=[
                    pl.BlockSpec((1, 1, KP), lambda qi: (qi, 0, 0)),
                    pl.BlockSpec((1, H, 128), lambda qi: (qi, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, KP, 128), lambda qi: (qi, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((Q, KP, 128), x3.dtype),
                interpret=interpret,
            )(rowof, x3)

        # correctness on first variant that compiles
        try:
            out = np.asarray(run(x3, rowof))
            ref = np.asarray(x3)[np.arange(Q)[:, None], rowof_np[:, 0]]
            ok = np.array_equal(out, ref)
            print(f"H={H}: correctness {'OK' if ok else 'MISMATCH'}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"H={H}: compile FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue

        def f(x3, rowof, acc, run=run):
            o = run(x3 + acc * 0, rowof)
            return o[0, 0, 0]

        dev_time(f, (x3, rowof), f"dynamic_gather H={H} (1024 rows/query)")

    print("done", flush=True)


if __name__ == "__main__":
    main()

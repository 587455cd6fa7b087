"""Selection-cost grid: tree_with_maxes over (Q, N, k) for the layout model.

Calibrates the per-bucket selection term of the MS MARCO layout cost
model (VERDICT r2 item 3): how does the per-bucket tree scale with chunk
size Q and bucket rows N at k=100/1000?  Run on the real chip.

Run: PYTHONPATH=. python scripts/exp_r3_tree_grid.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bm25_tpu.ops.topk import top_k_tree_with_maxes

ITERS = 6


def timed(make_body, args, iters=ITERS):
    def looped(n):
        @jax.jit
        def f(*a):
            def body(i, acc):
                return make_body(*a, acc)

            return lax.fori_loop(0, n, body, jnp.float32(0))

        return f

    f1, fn_ = looped(1), looped(iters)
    float(f1(*args)); float(fn_(*args))

    def t(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(t(fn_) - t(f1), 0.0) / (iters - 1) * 1e3


def main():
    print(f"device: {jax.devices()[0].platform}")
    for q in (128, 512):
        for n in (262144, 1048576, 2228224):
            base = jax.random.normal(jax.random.PRNGKey(0), (q, n),
                                     jnp.float32)
            gmax = jax.jit(
                lambda b: jnp.max(b.reshape(q, n // 8, 8), axis=-1)
            )(base)
            for k in (100, 1000):

                def body(base, gmax, acc, k=k):
                    v, _ = top_k_tree_with_maxes(base, gmax + acc * 0, k)
                    return v[0, 0]

                ms = timed(body, (base, gmax))
                print(f"[grid] Q={q:<4d} N={n:<8d} k={k:<5d} "
                      f"tree={ms:7.2f} ms  per-query={ms/q*1e3:6.1f} us")
            del base, gmax


if __name__ == "__main__":
    main()

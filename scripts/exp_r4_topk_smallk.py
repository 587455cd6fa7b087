"""Round-4 item 8: dispose of the literal two-stage Pallas top-k.

PARITY row 9 carries a "never auto-selected" literal two-stage kernel
(ops/topk.py::_pallas_topk_lastaxis — k-round extraction per VMEM block
+ single merge, the reference's topk.mojo:576-830 shape).  Round-2/3
measurements only covered the large-k bench shapes (k=100/1000) where
its O(k) passes lose to the tournament tree.  Its plausible niche is
SMALL k (k <= 64, serving-style shapes) where k rounds are cheap and the
tree's level hierarchy is overhead.  This measures all three selectors
(lax, tree, pallas two-stage) across serving shapes x small k on the
real chip; the dispatch table then cites these numbers for every branch
(win -> auto-select there; loss -> recorded negative result).

Run on-chip: python scripts/exp_r4_topk_smallk.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bm25_tpu.ops.topk import top_k


def device_time(fn, x, iters, reps=3):
    def looped(n):
        @jax.jit
        def f(x):
            def body(i, acc):
                v, idx = fn(x + acc * 0)
                return (jnp.max(v) + jnp.max(idx).astype(jnp.float32)
                        ).astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0))

        return f

    f1, fn_ = looped(1), looped(iters)
    float(f1(x))
    float(fn_(x))

    def timed(g):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tn = timed(f1), timed(fn_)
    return max((tn - t1) / (iters - 1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=128)
    args = ap.parse_args()

    shapes = [(8, 131072), (32, 524288), (128, 65536), (512, 524288)]
    ks = [1, 8, 16, 32, 64]
    for q, n in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((q, n), dtype=np.float32))
        for k in ks:
            row = {}
            for impl in ("lax", "tree", "pallas"):
                try:
                    fn = lambda x, impl=impl, k=k: top_k(  # noqa: E731
                        x, k, implementation=impl)
                    # correctness spot-check vs lax before timing
                    v, i = jax.jit(fn)(x[:2])
                    vl, il = jax.jit(lambda x: top_k(x, k,
                                                     implementation="lax")
                                     )(x[:2])
                    np.testing.assert_allclose(np.asarray(v),
                                               np.asarray(vl), rtol=1e-6)
                    row[impl] = device_time(fn, x, args.iters)
                except Exception as e:
                    row[impl] = None
                    print(f"[topk] ({q},{n}) k={k} {impl}: FAIL "
                          f"{type(e).__name__}: {str(e)[:100]}", flush=True)
            msg = " ".join(
                f"{impl}={row[impl]*1e3:.3f}ms" if row[impl] else f"{impl}=-"
                for impl in ("lax", "tree", "pallas")
            )
            best = min((t for t in row.values() if t), default=None)
            winner = [i for i, t in row.items() if t == best]
            print(f"[topk] ({q:4d},{n:7d}) k={k:3d}  {msg}  "
                  f"winner={winner[0] if winner else '-'}", flush=True)


if __name__ == "__main__":
    main()

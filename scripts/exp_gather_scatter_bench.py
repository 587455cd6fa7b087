"""Benchmark the XLA gather/scatter family vs Pallas at scoring shapes.

VERDICT r2 weak item 5: ``ops/gather_scatter.py`` wraps XLA primitives and
claims "the compiler's job" without numbers.  This measures, on the real
chip at retrieval-relevant shapes:

  * gather_reduce (EmbeddingBag-style fused gather+sum — the reference's
    ``gather_scatter.mojo:116-281``) vs the Pallas scalar-prefetch
    ``gather_add_rows`` kernel on the dense-scoring shape
  * gather (ONNX semantics, axis 0) vs a jnp.take row gather
  * scatter_nd add vs the functional ``.at[].add`` it wraps, at the
    index-build count-matrix shape

Run: PYTHONPATH=. python scripts/exp_gather_scatter_bench.py
Numbers land in NOTES.md; PARITY.md row 10 cites them.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS = 8


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
    from bm25_tpu.ops.gather_rows import gather_add_rows
    from bm25_tpu.ops.gather_scatter import gather, gather_reduce, scatter_nd

    print(f"device: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)

    # dense scoring shape (same as the round-2 NOTES row): (V_pad, D)
    v_pad, d, q, t = 4104, 65664, 512, 8
    st = jnp.asarray(rng.standard_normal((v_pad, d), dtype=np.float32))
    ids = jnp.asarray(
        rng.integers(0, v_pad - 1, size=(q, t)).astype(np.int32)
    )

    def body_pallas(st, ids, acc):
        out = gather_add_rows(st, ids + (acc * 0).astype(jnp.int32))
        return out[0, 0]

    def body_reduce(st, ids, acc):
        out = gather_reduce(st, ids + (acc * 0).astype(jnp.int32))
        return out[0, 0]

    def body_take(st, ids, acc):
        safe = ids + (acc * 0).astype(jnp.int32)
        out = jnp.take(st, safe, axis=0).sum(axis=1)
        return out[0, 0]

    print(f"gather+sum (Q={q},T={t}) from ({v_pad},{d}):")
    print(f"  pallas gather_add_rows   {timed(body_pallas, (st, ids)):8.2f} ms")
    print(f"  XLA gather_reduce        {timed(body_reduce, (st, ids)):8.2f} ms")
    print(f"  jnp.take + sum           {timed(body_take, (st, ids)):8.2f} ms")

    # plain gather: 36864 rows of width 512 (the round-2 tail-tier shape)
    tbl = jnp.asarray(rng.standard_normal((131072, 512), dtype=np.float32))
    gi = jnp.asarray(rng.integers(0, 131072, size=(36864,)).astype(np.int32))

    def body_gather(tbl, gi, acc):
        out = gather(tbl, gi + (acc * 0).astype(jnp.int32), axis=0)
        return out[0, 0]

    print("row gather 36864 x 512 from (131072, 512):")
    print(f"  XLA gather (ONNX)        {timed(body_gather, (tbl, gi)):8.2f} ms")

    # scatter-add at the count-matrix shape (Q, H) with T updates/row
    h = 1024
    hot_ids = jnp.asarray(rng.integers(0, h, size=(q, t)).astype(np.int32))
    w = jnp.asarray(rng.random((q, t)).astype(np.float32))
    rows = jnp.broadcast_to(jnp.arange(q)[:, None], (q, t))

    def body_at_add(hot_ids, w, acc):
        safe = hot_ids + (acc * 0).astype(jnp.int32)
        cf = jnp.zeros((q, h), jnp.float32).at[rows, safe].add(w)
        return cf[0, 0]

    def body_scatter_nd(hot_ids, w, acc):
        safe = hot_ids + (acc * 0).astype(jnp.int32)
        idx = jnp.stack([rows.reshape(-1), safe.reshape(-1)], axis=-1)
        cf = scatter_nd(
            jnp.zeros((q, h), jnp.float32), idx, w.reshape(-1),
            reduction="add",
        )
        return cf[0, 0]

    print(f"scatter-add ({q},{t}) updates into ({q},{h}):")
    print(f"  .at[].add                {timed(body_at_add, (hot_ids, w)):8.2f} ms")
    print(f"  scatter_nd(add)          {timed(body_scatter_nd, (hot_ids, w)):8.2f} ms")


if __name__ == "__main__":
    main()

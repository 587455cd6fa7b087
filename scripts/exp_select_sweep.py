"""On-chip sweep of exact top-k selection variants at the bench bucket shape.

The k=1000 device step spends ~half its time in per-bucket selection
(4 buckets x ~16 ms tree top-k at (512, 131072)); this sweeps the tree's
parameters and two structural variants to see if the selection half can
shrink.  Relay-proof timing: dependency-chained fori_loop, one fetch.

Run: python scripts/exp_select_sweep.py  (needs the TPU)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bm25_tpu.ops.topk import top_k_tree, _sorted_topk
from bm25_tpu.utils.padding import next_multiple

Q, N = 512, 131072


def timed_loop(fn, x, iters=8):
    """(t(iters) - t(1)) / (iters - 1) in ms; fn must return something small."""

    def looped(n):
        @jax.jit
        def f(x):
            def body(i, acc):
                v, i_ = fn(x + (acc * 0))
                return v[0, 0] + i_[0, 0].astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0))

        return f

    f1, fn_ = looped(1), looped(iters)
    float(f1(x)); float(fn_(x))  # compile

    def t(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tn = t(f1), t(fn_)
    return max(tn - t1, 0.0) / (iters - 1) * 1e3


def packed_sort_topk(x, k):
    """Single-operand sort: orderable-uint32 score + doc id packed in int64."""
    # order-preserving f32 -> uint32 (flip sign bit for positives, all bits
    # for negatives), then descending == ascending of the complement
    bits = lax.bitcast_convert_type(x, jnp.uint32)
    key32 = jnp.where(
        (bits >> 31) == 0, bits | jnp.uint32(0x80000000), ~bits
    )
    inv = (~key32).astype(jnp.uint64)  # ascending sort -> descending scores
    idx = lax.broadcasted_iota(jnp.uint32, x.shape, 1).astype(jnp.uint64)
    packed = (inv << jnp.uint64(32)) | idx
    sp = lax.sort(packed.astype(jnp.int64), is_stable=False)
    top = sp[:, :k]
    ui = lax.bitcast_convert_type(top, jnp.uint64)
    doc = (ui & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32)
    key = (~(ui >> jnp.uint64(32)).astype(jnp.uint32))
    vb = jnp.where((key >> 31) != 0, key & jnp.uint32(0x7FFFFFFF), ~key)
    vals = lax.bitcast_convert_type(vb, jnp.float32)
    return vals, doc


def tree_packed(x, k, branch=8, base=4096):
    """Tree with packed single-operand sorts at the merge levels."""
    b, n = x.shape
    if n <= base or n // branch < k:
        return packed_sort_topk(x, k)
    n_pad = next_multiple(n, branch)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)), constant_values=-jnp.inf)
    groups = x.reshape(b, n_pad // branch, branch)
    maxes = jnp.max(groups, axis=-1)
    _, top_groups = tree_packed(maxes, k, branch, base)
    top_groups = jnp.sort(top_groups, axis=1)
    cand = jnp.take_along_axis(groups, top_groups[:, :, None], axis=1)
    cand = cand.reshape(b, k * branch)
    # local positions -> global indices after the packed sort
    sub = jnp.broadcast_to(
        jnp.arange(branch, dtype=jnp.int32)[None, None, :], (b, k, branch)
    ).reshape(b, k * branch)
    gid = (top_groups[:, :, None] * branch).astype(jnp.int32)
    gid = jnp.broadcast_to(gid, (b, k, branch)).reshape(b, k * branch)
    v, p = packed_sort_topk(cand, k)
    # p indexes cand: recover global doc id
    g = jnp.take_along_axis(gid + sub, p, axis=1)
    return v, g


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((Q, N), dtype=np.float32))
    print(f"shape=({Q},{N}) platform={jax.devices()[0].platform}")

    for k in (1000, 100):
        print(f"-- k={k}")
        rows = []
        for branch, base in [(8, 4096), (8, 2048), (8, 8192), (4, 4096),
                             (16, 4096), (8, 16384), (16, 16384)]:
            ms = timed_loop(
                lambda xx, br=branch, ba=base: top_k_tree(xx, k, br, ba), x
            )
            rows.append((f"tree b={branch} base={base}", ms))
        rows.append(("tree packed-sort b=8 base=4096",
                     timed_loop(lambda xx: tree_packed(xx, k), x)))
        rows.append(("packed full sort",
                     timed_loop(lambda xx: packed_sort_topk(xx, k), x)))
        # sanity parity on the winner shapes
        for name, ms in sorted(rows, key=lambda r: r[1]):
            print(f"  {name:34s} {ms:7.2f} ms")
        v0, i0 = jax.jit(lambda xx: top_k_tree(xx, k))(x)
        v1, i1 = jax.jit(lambda xx: tree_packed(xx, k))(x)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        print("  parity tree vs packed: OK")


if __name__ == "__main__":
    main()

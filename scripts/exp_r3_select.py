"""Round-3 selection levers at the k=1000 bench shape (on-chip, relay-proof).

VERDICT r2 item 1: the ~34 ms selection block is the last big piece of the
78 ms k=1000 step.  This measures, per bucket shape (512, 262144):

  A. current: top_k_tree_with_maxes(base, gmax8, k)      [branch 8]
  B. kernel GROUP=16/32: tree_with_maxes at branch 16/32 (gmax precomputed,
     simulating a deeper in-kernel first level)
  C. two-level maxes: gmax8 AND gmax64 precomputed (the kernel would emit
     both), so the tree's first TWO levels skip their reductions
  D. component split of A: recursion-on-gmax vs gather+final-sort

plus the cross-bucket theta-prune (bucket 1's kth score bounds bucket 2's
candidate groups; m-group budget with exactness check).

Run: PYTHONPATH=. python scripts/exp_r3_select.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bm25_tpu.ops.topk import (_sorted_topk, _tree_level, top_k_tree,
                               top_k_tree_with_maxes)

Q = 512
N = 262144  # one bench bucket (524288 docs / 2 buckets)
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


def gmax_of(base, g):
    q, n = base.shape
    return jnp.max(base.reshape(q, n // g, g), axis=-1)


def tree_two_level(base, gmax8, gmax64, k, branch=8):
    """top_k_tree_with_maxes whose SECOND level is also precomputed."""
    b, n = base.shape
    groups = base.reshape(b, n // branch, branch)
    # recursion over gmax8 with ITS maxes precomputed
    _, top_groups = _tree_level(gmax8, k, branch, max(2 * k, 4096),
                                maxes=gmax64)
    top_groups = jnp.sort(top_groups, axis=1)
    cand = jnp.take_along_axis(groups, top_groups[:, :, None], axis=1)
    cand = cand.reshape(b, k * branch)
    cand_idx = (
        top_groups[:, :, None] * branch + jnp.arange(branch)[None, None, :]
    ).reshape(b, k * branch)
    return _sorted_topk(cand, cand_idx, k)


def theta_pruned_bucket(base, gmax, k, theta, m, branch=8):
    """Candidates of this bucket that can displace a prior bucket's top-k.

    ``theta (Q,)``: the prior bucket's running k-th score.  Only docs with
    score >= theta matter; every group holding one has gmax >= theta.  Take
    the top-m groups by gmax (m << k); exact when < m groups qualify,
    checked per batch — fallback runs the full tree.  Returns (vals, idx,
    exact_flag).
    """
    b, n = base.shape
    groups = base.reshape(b, n // branch, branch)
    _, top_groups = _tree_level(gmax, m, branch, max(2 * m, 4096))
    top_groups = jnp.sort(top_groups, axis=1)
    gvals = jnp.take_along_axis(gmax, top_groups, axis=1)  # (b, m) maxes
    # exact iff the m-th best gmax is already below theta for every query
    # (then NO unselected group can hold a qualifying doc)
    ok = jnp.all(gvals[:, -1] < theta)
    cand = jnp.take_along_axis(groups, top_groups[:, :, None], axis=1)
    cand = cand.reshape(b, m * branch)
    cand_idx = (
        top_groups[:, :, None] * branch + jnp.arange(branch)[None, None, :]
    ).reshape(b, m * branch)
    kk = min(k, m * branch)
    v, i = _sorted_topk(cand, cand_idx, kk)
    return v, i, ok


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}")
    key = jax.random.PRNGKey(0)
    base1 = jax.random.normal(key, (Q, N), jnp.float32)
    base2 = jax.random.normal(jax.random.PRNGKey(1), (Q, N), jnp.float32)
    # length-skewed variant: bucket 2 (long docs) scores ~0.5 higher — the
    # realistic case for theta pruning (buckets are nnz-sorted)
    base2_hi = base2 + 0.5

    g8_1 = jax.jit(gmax_of, static_argnums=1)(base1, 8)
    g8_2h = jax.jit(gmax_of, static_argnums=1)(base2_hi, 8)

    for k in (1000, 100):
        print(f"== k={k}, per-bucket (Q={Q}, N={N}) ==")

        def cur(base, g8, acc):
            v, _ = top_k_tree_with_maxes(base, g8 + acc * 0, k)
            return v[0, 0]

        print(f"  A  tree_with_maxes b=8     "
              f"{timed(cur, (base1, g8_1)):7.2f} ms")

        for br in (16, 32):
            gb = jax.jit(gmax_of, static_argnums=1)(base1, br)

            def kern_group(base, g, acc, br=br):
                v, _ = top_k_tree_with_maxes(base, g + acc * 0, k, branch=br)
                return v[0, 0]

            print(f"  B  tree_with_maxes b={br:<3d}   "
                  f"{timed(kern_group, (base1, gb)):7.2f} ms")

        g64_1 = jax.jit(gmax_of, static_argnums=1)(g8_1, 8)

        def two_level(base, g8, g64, acc):
            v, _ = tree_two_level(base, g8 + acc * 0, g64 + acc * 0, k)
            return v[0, 0]

        print(f"  C  two-level maxes 8+64    "
              f"{timed(two_level, (base1, g8_1, g64_1)):7.2f} ms")

        # D: components of A
        def rec_only(g8, acc):
            v, _ = top_k_tree(g8 + acc * 0, k)
            return v[0, 0]

        print(f"  D1 recursion on gmax only  "
              f"{timed(rec_only, (g8_1,)):7.2f} ms")

        tg = jax.jit(
            lambda g: jnp.sort(top_k_tree(g, k)[1], axis=1)
        )(g8_1)

        def gather_sort(base, tg, acc):
            groups = base.reshape(Q, N // 8, 8)
            cand = jnp.take_along_axis(
                groups, (tg + acc.astype(jnp.int32) * 0)[:, :, None], axis=1
            ).reshape(Q, k * 8)
            cand_idx = (
                tg[:, :, None] * 8 + jnp.arange(8)[None, None, :]
            ).reshape(Q, k * 8)
            v, _ = _sorted_topk(cand, cand_idx, k)
            return v[0, 0]

        print(f"  D2 gather + final sort     "
              f"{timed(gather_sort, (base1, tg)):7.2f} ms")

        # E: theta-prune, bucket pair (high bucket first)
        for m in (256, 128):
            if m * 8 < k:
                continue

            def pair(b_hi, g_hi, b_lo, acc):
                v1, _ = top_k_tree_with_maxes(b_hi, g_hi + acc * 0, k)
                theta = v1[:, -1:]
                g_lo = gmax_of(b_lo, 8)
                v2, _, ok = theta_pruned_bucket(b_lo, g_lo, k, theta, m)
                return v1[0, 0] + v2[0, 0] + ok.astype(jnp.float32)

            ms = timed(pair, (base2_hi, g8_2h, base1))
            # exactness rate on this data
            v1, _ = top_k_tree_with_maxes(base2_hi, g8_2h, k)
            g_lo = jax.jit(gmax_of, static_argnums=1)(base1, 8)
            _, _, ok = jax.jit(
                lambda b, g, t: theta_pruned_bucket(b, g, k, t, m)
            )(base1, g_lo, v1[:, -1:])
            print(f"  E  theta-prune pair m={m:<4d} {ms:7.2f} ms  "
                  f"(vs 2x A; exact={bool(ok)})")

        # F: plain pair baseline (2x A) for comparison
        def pair_base(b1, g1, b2, g2, acc):
            v1, _ = top_k_tree_with_maxes(b1, g1 + acc * 0, k)
            v2, _ = top_k_tree_with_maxes(b2, g2 + acc * 0, k)
            return v1[0, 0] + v2[0, 0]

        print(f"  F  pair baseline (2x A)    "
              f"{timed(pair_base, (base2_hi, g8_2h, base1, g8_1)):7.2f} ms")


if __name__ == "__main__":
    main()

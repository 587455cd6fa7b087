"""Prototype: union group-tournament selection across ELL buckets.

Current per-bucket selection at k=1000 costs 4 x ~17 ms (one tree per
bucket) because every bucket pays its own merge sorts.  This selects over
ALL buckets at once:

  pass 1: per bucket, 8-group maxima (reshape-reduce, no gathers);
          one tree top-k over the concatenated (Q, G_total) maxima
          -> k groups by (max, position); theta = k-th group max.
  pass 2 (exact tie rescue): per bucket z_g = max over group of
          (val == theta ? -doc : INT_MIN)  [doc ids broadcast, no gathers];
          one int tree top-k over (Q, G_total) -> the k groups holding the
          k smallest docs with score == theta.
  gather: both passes' groups' 8-element slices (values + doc ids, block
          gathers from (G, 8) tables); mask pass-2 groups already in pass 1.
  final:  one two-key sort (score desc, doc asc) over (Q, 16k) -> top k.

Exactness: every element with score > theta lives in a pass-1 group (its
group max > theta = k-th group max, so the group ranks above the k-th);
candidates contain >= k elements >= theta, so the k-th true score s_k >=
theta and all elements with score > theta are candidates.  Elements at
score == theta matter only through the smallest doc ids; the k groups with
the smallest min-doc-at-theta contain the k smallest theta-docs (k groups
with smaller min-docs would otherwise each hold a smaller theta-doc).
Ties resolve to the smaller doc id — same contract as the oracle.

Measures both schemes + checks exact equality (incl. planted cross-bucket
score ties) vs a numpy oracle.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bm25_tpu.ops.topk import top_k_tree, select_top_k

Q = 512
ROWS = [131072, 131072, 131072, 131072]
GROUP = 8
INT_MIN = np.int32(np.iinfo(np.int32).min)
DOC_SENTINEL = np.int32(2**31 - 1)
NEG_INF = float("-inf")


def union_select(bases, dids, k):
    """bases: list of (Q, rows_b) f32; dids: list of (rows_b,) int32 (-1 pad).
    Returns (scores, docs) top-k, ties -> smaller doc."""
    q = bases[0].shape[0]
    gmaxes, zs, base_g, did_g = [], [], [], []
    for base, did in zip(bases, dids):
        rows = base.shape[1]
        g = rows // GROUP
        b3 = base.reshape(q, g, GROUP)
        gmaxes.append(jnp.max(b3, axis=-1))
        base_g.append(b3)
        did_g.append(did.reshape(g, GROUP))
    gmax = jnp.concatenate(gmaxes, axis=1)  # (Q, G_total)
    gv, gpos1 = top_k_tree(gmax, k)
    theta = gv[:, k - 1]  # (Q,)

    for base, did in zip(bases, dids):
        rows = base.shape[1]
        g = rows // GROUP
        y = jnp.where(
            (base == theta[:, None]) & (did[None, :] >= 0),
            jnp.where(did[None, :] >= 0, -did[None, :], INT_MIN),
            INT_MIN,
        )
        zs.append(jnp.max(y.reshape(q, g, GROUP), axis=-1))
    z = jnp.concatenate(zs, axis=1)
    _, gpos2 = top_k_tree(z, k)

    # mask pass-2 groups already selected by pass 1 (dedup without a sort)
    dup = (gpos2[:, :, None] == gpos1[:, None, :]).any(-1)  # (Q, k)

    def gather_groups(gpos):
        gpos = jnp.sort(gpos, axis=1)
        vals = jnp.full((q, gpos.shape[1], GROUP), NEG_INF, jnp.float32)
        docs = jnp.full((q, gpos.shape[1], GROUP), DOC_SENTINEL, jnp.int32)
        off = 0
        for b3, dg in zip(base_g, did_g):
            gb = b3.shape[1]
            rel = gpos - off
            in_b = (rel >= 0) & (rel < gb)
            relc = jnp.clip(rel, 0, gb - 1)
            v = jnp.take_along_axis(b3, relc[:, :, None], axis=1)
            d = jnp.take(dg, relc, axis=0)  # (Q, k, GROUP)
            vals = jnp.where(in_b[:, :, None], v, vals)
            docs = jnp.where(in_b[:, :, None], d, docs)
            off += gb
        return vals, docs, gpos

    v1, d1, _ = gather_groups(gpos1)
    v2, d2, gpos2s = gather_groups(gpos2)
    # dup mask must follow the sort applied inside gather_groups
    order2 = jnp.argsort(gpos2, axis=1)
    dup = jnp.take_along_axis(dup, order2, axis=1)
    v2 = jnp.where(dup[:, :, None], NEG_INF, v2)
    d2 = jnp.where(dup[:, :, None], DOC_SENTINEL, d2)

    cand_v = jnp.concatenate(
        [v1.reshape(q, -1), v2.reshape(q, -1)], axis=1
    )
    cand_d = jnp.concatenate(
        [d1.reshape(q, -1), d2.reshape(q, -1)], axis=1
    )
    cand_v = jnp.where(cand_d == DOC_SENTINEL, NEG_INF, cand_v)
    cand_v = jnp.where(cand_d < 0, NEG_INF, cand_v)  # pad rows
    nss, dd = lax.sort((-cand_v, cand_d), num_keys=2, is_stable=False)
    return -nss[:, :k], dd[:, :k]


def per_bucket_select(bases, dids, k):
    cand_s, cand_i = [], []
    prev = None
    for base, did in zip(bases, dids):
        if prev is not None:
            base, _ = lax.optimization_barrier((base, prev))
        kk = min(k, base.shape[1])
        s, pos = select_top_k(base, kk)
        cand_s.append(s)
        cand_i.append(did[pos])
        prev = s
    cs = jnp.concatenate(cand_s, axis=1)
    ci = jnp.concatenate(cand_i, axis=1)
    nss, dd = lax.sort((-cs, ci), num_keys=2, is_stable=False)
    return -nss[:, :k], dd[:, :k]


def oracle(bases, dids, k):
    allv = np.concatenate([np.asarray(b) for b in bases], axis=1)
    alld = np.concatenate([np.asarray(d) for d in dids])
    out_s = np.zeros((allv.shape[0], k), np.float32)
    out_d = np.zeros((allv.shape[0], k), np.int32)
    for qi in range(allv.shape[0]):
        keep = alld >= 0
        v, d = allv[qi][keep], alld[keep]
        order = np.lexsort((d, -v))[:k]
        out_s[qi], out_d[qi] = v[order], d[order]
    return out_s, out_d


def timed_loop(fn, args, iters=6):
    def looped(n):
        @jax.jit
        def f(*a):
            def body(i, acc):
                s, d = fn([x + (acc * 0) for x in a[: len(ROWS)]],
                          list(a[len(ROWS):]), K)
                return s[0, 0] + d[0, 0].astype(jnp.float32)
            return lax.fori_loop(0, n, body, jnp.float32(0))
        return f
    f1, fn_ = looped(1), looped(iters)
    float(f1(*args)); float(fn_(*args))
    def t(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(f(*args)); best = min(best, time.perf_counter() - t0)
        return best
    return max(t(fn_) - t(f1), 0.0) / (iters - 1) * 1e3


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    # interleaved doc ids across buckets (like length-bucketing produces)
    total = sum(ROWS)
    perm = rng.permutation(total).astype(np.int32)
    dids_np, off = [], 0
    for r in ROWS:
        dids_np.append(np.sort(perm[off : off + r]))
        off += r
    bases_np = [
        rng.standard_normal((Q, r), dtype=np.float32).round(2)  # force ties
        for r in ROWS
    ]
    # plant heavy cross-bucket ties at the boundary
    for b in bases_np:
        b[:, : Q // 2] = 3.14
    bases = [jnp.asarray(b) for b in bases_np]
    dids = [jnp.asarray(d) for d in dids_np]

    for K in (1000, 100):
        s0, d0 = jax.jit(lambda b, d: per_bucket_select(b, d, K))(bases, dids)
        s1, d1 = jax.jit(lambda b, d: union_select(b, d, K))(bases, dids)
        so, do = oracle(bases, dids, K)
        np.testing.assert_allclose(np.asarray(s0), so, rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(d0), do)
        np.testing.assert_allclose(np.asarray(s1), so, rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(d1), do)
        print(f"k={K}: exactness incl. planted ties OK")
        t_old = timed_loop(per_bucket_select, tuple(bases) + tuple(dids))
        t_new = timed_loop(union_select, tuple(bases) + tuple(dids))
        print(f"k={K}: per-bucket {t_old:.2f} ms  union {t_new:.2f} ms")

#!/usr/bin/env python3
"""Per-stage on-chip timing of the tail-tier candidate pipeline."""

import os
import time

import numpy as np


def timeit(fn, *args, n=5):
    r = fn(*args)
    jax_block(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax_block(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def jax_block(x):
    import jax

    leaves = jax.tree.leaves(x)
    for l in leaves:
        np.asarray(jax.device_get(l[..., :1]))  # scalar-ish fetch forces exec


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    Q, T, C, P = 512, 8, 9, 512
    R = 18210
    D = 524288
    docs = rng.integers(0, D, size=(R, P), dtype=np.int32)
    vals = rng.random((R, P), dtype=np.float32)
    toks = rng.integers(0, 32768, size=(R, P), dtype=np.int32)
    rows_idx = rng.integers(0, R, size=(Q, T * C), dtype=np.int32)
    d_docs = jnp.asarray(docs)
    d_vals = jnp.asarray(vals)
    d_toks = jnp.asarray(toks)
    d_rows = jnp.asarray(rows_idx)
    qtok = jnp.asarray(rng.integers(0, 32768, size=(Q, T), dtype=np.int32))

    @jax.jit
    def stage_gather(rows, dd, dv, dt):
        return (
            jnp.take(dd, rows, axis=0),
            jnp.take(dv, rows, axis=0),
            jnp.take(dt, rows, axis=0),
        )

    t = timeit(stage_gather, d_rows, d_docs, d_vals, d_toks)
    print(f"gather 3x (Q,T*C,P): {t*1e3:.1f} ms", flush=True)

    g_docs, g_vals, g_toks = jax.jit(stage_gather)(d_rows, d_docs, d_vals, d_toks)
    N = T * C * P

    @jax.jit
    def stage_mask_sort(gd, gv, gt, qt):
        mine = gt == jnp.repeat(qt, C, axis=1)[:, :, None]
        cd = jnp.where(mine, gd, np.int32(2**31 - 1)).reshape(Q, N)
        cv = jnp.where(mine, gv, 0.0).reshape(Q, N)
        sd, sv = lax.sort((cd, cv), num_keys=1, is_stable=False)
        return sd, sv

    t = timeit(stage_mask_sort, g_docs, g_vals, g_toks, qtok)
    print(f"mask+sort (Q,{N}): {t*1e3:.1f} ms", flush=True)

    sd, sv = jax.jit(stage_mask_sort)(g_docs, g_vals, g_toks, qtok)

    @jax.jit
    def stage_segsum(sd, sv):
        tot = sv
        for s in range(1, T):
            pd = jnp.pad(sd[:, :-s], ((0, 0), (s, 0)), constant_values=-9)
            pv = jnp.pad(sv[:, :-s], ((0, 0), (s, 0)))
            tot = tot + jnp.where(pd == sd, pv, 0.0)
        nxt = jnp.pad(sd[:, 1:], ((0, 0), (0, 1)), constant_values=-9)
        is_cand = (sd != nxt) & (sd != 2**31 - 1)
        return tot, is_cand

    t = timeit(stage_segsum, sd, sv)
    print(f"segsum (Q,{N}): {t*1e3:.1f} ms", flush=True)

    tot, is_cand = jax.jit(stage_segsum)(sd, sv)
    base = jnp.asarray(rng.random((Q, 132096), dtype=np.float32))
    gpos = jnp.asarray(rng.integers(0, 132096, size=(Q, N), dtype=np.int32))

    @jax.jit
    def stage_lookup(base, gpos, ic):
        look = jnp.take_along_axis(base, jnp.where(ic, gpos, 0), axis=1)
        return jnp.where(ic, look, 0.0)

    t = timeit(stage_lookup, base, gpos, is_cand)
    print(f"base take_along_axis per bucket (Q,{N}): {t*1e3:.1f} ms", flush=True)

    all_d = jnp.concatenate([jnp.asarray(rng.integers(0, D, (Q, 400), dtype=np.int32)), jnp.where(is_cand, sd, 2**31 - 1)], axis=1)
    all_s = jnp.concatenate([jnp.asarray(rng.random((Q, 400), dtype=np.float32)), tot], axis=1)

    @jax.jit
    def stage_dedup_select(ad, as_):
        dd, nss = lax.sort((ad, -as_), num_keys=2, is_stable=False)
        ss = -nss
        prev = jnp.pad(dd[:, :-1], ((0, 0), (1, 0)), constant_values=-9)
        ss = jnp.where(dd == prev, -jnp.inf, ss)
        from bm25_tpu.ops.topk import select_top_k

        ms, mpos = select_top_k(ss, 100)
        return ms, jnp.take_along_axis(dd, mpos, axis=1)

    t = timeit(stage_dedup_select, all_d, all_s)
    print(f"dedup 2-key sort + select k=100 (Q,{N+400}): {t*1e3:.1f} ms", flush=True)

    # reference points
    x = jnp.asarray(rng.random((Q, D), dtype=np.float32))

    @jax.jit
    def ref_topk(x):
        from bm25_tpu.ops.topk import select_top_k

        return select_top_k(x, 1000)

    t = timeit(ref_topk, x)
    print(f"tree top-k k=1000 (Q,{D}): {t*1e3:.1f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()

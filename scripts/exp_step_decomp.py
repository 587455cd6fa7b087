"""Decompose the SparseEngine device step at bench scale (relay-proof).

Measures, per k in {1000, 100}:
  - full step (as shipped)
  - step with selection replaced by a sum over the masked base (isolates
    scoring + hot + mask cost; the difference is the selection cost)
  - ELL kernels alone
plus a max_buckets=2 engine variant of the full step (selection count vs
ELL padding trade).

Run: PYTHONPATH=.:$PYTHONPATH python scripts/exp_step_decomp.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bm25_tpu.bench.query_bench import BenchConfig, make_queries, make_synthetic_index
from bm25_tpu.models.sparse import NEG_INF, SparseEngine
from bm25_tpu.utils.padding import next_multiple, next_pow2_at_least


def timed_loop(make_body, args, iters=6):
    def looped(n):
        @jax.jit
        def f(*args):
            def body(i, acc):
                return make_body(*args, acc)

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


def padded_ids(queries):
    q_real, t_real = queries.shape
    q_pad = next_multiple(q_real, 8)
    t_pad = next_pow2_at_least(max(t_real, 8))
    out = np.full((q_pad, t_pad), -1, dtype=np.int32)
    out[:q_real, :t_real] = queries
    return out


def bases_body(engine, k, mode):
    """mode: 'full' (select+merge), 'sum' (no selection), 'ell' (kernels only)."""
    from bm25_tpu.ops.ell_score import ell_score
    from bm25_tpu.ops.topk import select_top_k

    hot_h = engine.hot_h

    def body(ids, buckets, hot_table, acc):
        ids = ids + (acc * 0).astype(jnp.int32)
        q, t = ids.shape
        valid = ids >= 0
        safe = jnp.where(valid, ids, 0)
        hot_counts = None
        if hot_h > 0 and mode != "ell":
            hot_ids = jnp.where(valid, hot_table[safe], -1)
            hot_counts = jax.nn.one_hot(hot_ids, hot_h, dtype=jnp.bfloat16).sum(1)
        out = jnp.float32(0)
        prev = None
        for b in buckets:
            if prev is not None:
                ids_in, _ = lax.optimization_barrier((ids, prev))
            else:
                ids_in = ids
            base = None
            if "tokT" in b:
                base = ell_score(ids_in, b["tokT"], b["valT"])
            if hot_counts is not None:
                hot = jnp.dot(hot_counts, b["hotT"],
                              preferred_element_type=jnp.float32) + jnp.dot(
                    hot_counts, b["hotLo"], preferred_element_type=jnp.float32)
                base = hot if base is None else base + hot
            if base is None:
                continue
            if mode != "ell":
                base = jnp.where(b["doc_ids"][None, :] >= 0, base, NEG_INF)
            if mode == "full":
                s, pos = select_top_k(base, min(k, base.shape[1]))
                prev = s
                out = out + s[0, 0]
            else:
                prev = base
                out = out + jnp.sum(jnp.where(jnp.isfinite(base), base, 0.0)[0])
        return out

    return body


def main():
    cfg = BenchConfig.from_env()
    print(f"[decomp] {cfg.num_docs} docs, vocab {cfg.vocab}")
    index = make_synthetic_index(cfg)
    queries = make_queries(cfg)[: cfg.batch]
    ids_np = padded_ids(queries)

    for max_buckets in (4, 2):
        engine = SparseEngine.from_scored_index(index, max_buckets=max_buckets)
        ids = engine.session.put(ids_np)
        args = (ids, engine.buckets, engine.hot_table)
        widths = [b["tokT"].shape[0] if "tokT" in b else 0 for b in engine.buckets]
        rows = [b["doc_ids"].shape[0] for b in engine.buckets]
        slots = sum(w * r for w, r in zip(widths, rows))
        print(f"-- max_buckets={max_buckets}: widths={widths} rows={rows} "
              f"padded_slots={slots/1e6:.1f}M")
        ell = timed_loop(bases_body(engine, 0, "ell"), args)
        base = timed_loop(bases_body(engine, 0, "sum"), args)
        print(f"   ELL kernels only      {ell:7.2f} ms")
        print(f"   + hot + mask (sum)    {base:7.2f} ms  (epilogue ~{base-ell:.2f})")
        for k in (1000, 100):
            full = timed_loop(bases_body(engine, k, "full"), args)
            print(f"   full step k={k:<5d}     {full:7.2f} ms  "
                  f"(selection ~{full-base:.2f})")
        del engine, args, ids


if __name__ == "__main__":
    main()

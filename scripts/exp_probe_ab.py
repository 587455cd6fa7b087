"""A/B the device-step probe: out[0,0] vs full-reduction consumption.

The matmul bench's out[0,0] consumption let XLA slice-simplify jnp.dot
(round-3 session 5).  The query bench's _time_step_chunk probes
leaf[0,0] of the packed result — if XLA were narrowing the selection
graph to query row 0, device_step_ms would UNDER-report.  This measures
both probes on the same engine/chunk on hardware.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bm25_tpu.bench.query_bench import (
    BenchConfig, make_queries, make_synthetic_index)
from bm25_tpu.models.sparse import SparseEngine, make_sparse_query_step


def main():
    cfg = BenchConfig(num_docs=131072, vocab=16384, num_queries=512,
                      batch=512)
    index = make_synthetic_index(cfg)
    eng = SparseEngine.from_scored_index(index)
    q = make_queries(cfg)[:512].astype(np.int32)
    for k in (100, 1000):
        plan = eng.plan_chunks(q, k=k)
        _, chunks = plan
        cq, padded, _w, cold_padded, _wc = chunks[0]
        step = make_sparse_query_step(
            min(k, eng.num_docs), eng.hot_h, pack=True,
            split_cold=cold_padded is not None)
        ids = eng.session.put(padded)
        cold = None if cold_padded is None else eng.session.put(cold_padded)
        for name, probe in (
            ("elem[0,0]", lambda out: (out[0] if isinstance(out, tuple)
                                       else out)[0, 0].astype(jnp.float32)),
            ("max(out)", lambda out: jnp.max(
                out[0] if isinstance(out, tuple) else out
            ).astype(jnp.float32)),
        ):
            def looped(n, probe=probe):
                if cold is None:
                    @jax.jit
                    def f(ids, buckets, offsets, hot_table, tail_arrs):
                        def body(i, acc):
                            out = step(ids + (acc * 0).astype(jnp.int32),
                                       buckets, offsets, hot_table, tail_arrs)
                            return probe(out)
                        return lax.fori_loop(0, n, body, jnp.float32(0))
                else:
                    @jax.jit
                    def f(ids, cold, buckets, offsets, hot_table, tail_arrs):
                        def body(i, acc):
                            out = step(ids + (acc * 0).astype(jnp.int32), cold,
                                       buckets, offsets, hot_table, tail_arrs)
                            return probe(out)
                        return lax.fori_loop(0, n, body, jnp.float32(0))
                return f

            args = [ids] + ([cold] if cold is not None else []) + [
                eng.buckets, eng.offsets, eng.hot_table, eng._tail]
            f1, fn = looped(1), looped(6)
            float(f1(*args)); float(fn(*args))
            t1 = min(_t(f1, args) for _ in range(3))
            tn = min(_t(fn, args) for _ in range(3))
            ms = (tn - t1) / 5 * 1e3
            print(f"k={k} probe={name}: {ms:7.2f} ms/chunk "
                  f"(rows={padded.shape[0]})", flush=True)


def _t(f, args):
    t0 = time.perf_counter()
    float(f(*args))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Capture a device profile of the BM25 query path.

TPU counterpart of the reference's ``profile_amd.sh`` (rocprof-compute):
runs a representative query workload under ``jax.profiler`` and writes a
Perfetto/XPlane trace for TensorBoard's profile plugin / xprof.

Usage: python scripts/profile_tpu.py [--docs 65536] [--out /tmp/bm25_trace]
"""

import argparse
import sys

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=65536)
    p.add_argument("--vocab", type=int, default=4096)
    p.add_argument("--queries", type=int, default=512)
    p.add_argument("--top-k", type=int, default=100)
    p.add_argument("--engine", default="auto")
    p.add_argument("--out", default="/tmp/bm25_trace")
    args = p.parse_args()

    from bm25_tpu.bench.query_bench import BenchConfig, make_queries, make_synthetic_index
    from bm25_tpu.models.auto import create_engine
    from bm25_tpu.runtime.profiling import capture_trace, host_span

    cfg = BenchConfig(num_docs=args.docs, vocab=args.vocab,
                      num_queries=args.queries)
    index = make_synthetic_index(cfg)
    engine = create_engine(index, mode=args.engine)
    queries = make_queries(cfg)

    # warm-up/compile outside the trace
    engine.search(queries, top_k=args.top_k)

    with capture_trace(args.out):
        with host_span("bm25_query_batch"):
            engine.search(queries, top_k=args.top_k)

    print(f"trace written to {args.out} — open with TensorBoard profile plugin")
    return 0


if __name__ == "__main__":
    sys.exit(main())

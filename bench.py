#!/usr/bin/env python3
"""Headline benchmark: batched BM25 query throughput on the local accelerator.

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
Baseline = the reference's CSC scoring algorithm (scipy, host CPU) on the
same synthetic Zipf corpus.  Tunable via BM25_BENCH_* env vars.
"""

import json
import os
import sys


def main() -> None:
    # persistent compile cache: repeated bench runs (and the driver's) skip
    # the expensive first-compile of the query kernels
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25"
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bm25_tpu.bench.query_bench import BenchConfig, run

    result = run(BenchConfig.from_env(), log=lambda *a: print(*a, file=sys.stderr))
    print(json.dumps(result))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Headline benchmark: batched BM25 query throughput on the local accelerator.

Prints the full result JSON line, then a compact headline JSON line
({"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., ...},
always < ~500 bytes) as the FINAL line so a tail-capture of stdout still
ends with one whole parseable object.
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

    from bm25_tpu.bench.query_bench import BenchConfig, compact_headline, run

    result = run(BenchConfig.from_env(), log=lambda *a: print(*a, file=sys.stderr))
    # full record first, then a compact headline as the FINAL line: the
    # driver captures only the tail of stdout, and round 4's full line
    # outgrew that capture (BENCH_r04.json parsed null).  The last line is
    # always a whole, parseable object under ~500 bytes.
    print(json.dumps(result))
    print(json.dumps(compact_headline(result)))


if __name__ == "__main__":
    main()

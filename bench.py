#!/usr/bin/env python3
"""Headline benchmark: batched BM25 query throughput on the local accelerator.

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
Baseline = the reference's CSC scoring algorithm (scipy, host CPU) on the
same synthetic Zipf corpus.  Tunable via BM25_BENCH_* env vars.
"""

import json
import sys


def main() -> None:
    from bm25_tpu.bench.query_bench import BenchConfig, run

    result = run(BenchConfig.from_env(), log=lambda *a: print(*a, file=sys.stderr))
    print(json.dumps(result))


if __name__ == "__main__":
    main()

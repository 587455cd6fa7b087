"""Benchmark harnesses: query throughput (bench.py headline) and matmul."""

from bm25_tpu.bench.query_bench import BenchConfig, run

__all__ = ["BenchConfig", "run"]

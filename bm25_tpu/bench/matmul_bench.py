"""Matmul kernel benchmark: GFLOPS + elements/sec for each algorithm.

Parity with the reference's Bench harness (``/root/reference/benchmarks.mojo
:103-170``): same default problem (M=K=N=1028 f32), same FLOPS formula
``M*N*(2K-1)`` (``benchmarks.mojo:111``), same metrics (flops + elements
throughput), benched over the kernel algorithms (xla / pallas naive /
pallas block-tiled).
"""

from __future__ import annotations

import time

import jax
import numpy as np


def bench_matmul(m: int = 1028, k: int = 1028, n: int = 1028,
                 iters: int = 10, algorithms=("xla", "naive", "optimized"),
                 log=print) -> list[dict]:
    from bm25_tpu.ops.matmul import matmul

    rng = np.random.default_rng(0)
    a = jax.device_put(rng.random((m, k), dtype=np.float32))
    b = jax.device_put(rng.random((k, n), dtype=np.float32))
    flops = m * n * (2 * k - 1)
    elements = m * n

    results = []
    for algo in algorithms:
        out = matmul(a, b, algorithm=algo)
        jax.block_until_ready(out)
        # force real completion through a scalar fetch (tunnel-safe)
        float(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = matmul(a, b, algorithm=algo)
        float(out[0, 0])
        dt = (time.perf_counter() - t0) / iters
        res = {
            "algorithm": algo,
            "seconds": dt,
            "gflops": flops / dt / 1e9,
            "melements_per_sec": elements / dt / 1e6,
        }
        results.append(res)
        log(f"[matmul {m}x{k}x{n}] {algo}: {dt*1e3:.2f} ms  "
            f"{res['gflops']:.1f} GFLOPS")
    return results

"""Matmul throughput characterization: where is the chip's ceiling?

The reference's headline benchmark is a 1028^3 f32 matmul
(/root/reference/benchmarks.mojo:103-170).  Recorded round-2 numbers
(508-696 GFLOPS, docs/design.md) are ~1% of the v5e MXU ceiling — this
experiment separates harness artifact from kernel quality:

  1. time the raw XLA dot at 1028^3 with a deeper dependency chain,
  2. sweep MXU-aligned sizes (1024/2048/4096) in f32 and bf16,
  3. time the Pallas kernels at the same shapes.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bm25_tpu.ops.matmul import matmul


def device_time(fn, *args, iters=30, reps=5):
    """Per-iteration device time via a dependency-chained fori_loop."""

    def looped(n):
        @jax.jit
        def f(*a):
            def body(i, acc):
                out = fn(a[0] + acc * 0, *a[1:])
                # max-reduce: a single-element probe lets XLA slice-simplify
                # jnp.dot down to one output element (measured 2000+ fake
                # TFLOPS); the max depends on every element
                return jnp.max(out).astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0))

        return f

    f1, fn_ = looped(1), looped(iters)
    float(f1(*args)); float(fn_(*args))  # compile + warm
    t1 = min(_t(f1, args) for _ in range(reps))
    tn = min(_t(fn_, args) for _ in range(reps))
    return max((tn - t1) / (iters - 1), 1e-9)


def _t(f, args):
    t0 = time.perf_counter()
    float(f(*args))
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].device_kind}")
    for m in (1028, 1024, 2048, 4096):
        for dtype in (np.float32, jnp.bfloat16):
            a = jax.device_put(rng.random((m, m), dtype=np.float32).astype(dtype))
            b = jax.device_put(rng.random((m, m), dtype=np.float32).astype(dtype))
            flops = m * m * (2 * m - 1)
            algos = ["xla"]
            if dtype is np.float32:
                algos += ["naive", "optimized"]
            for algo in algos:
                if algo == "xla":
                    fn = lambda x, y: jnp.dot(x, y)
                else:
                    fn = lambda x, y, _algo=algo: matmul(x, y, algorithm=_algo)
                try:
                    dt = device_time(fn, a, b)
                except Exception as e:  # noqa: BLE001
                    print(f"  {m}^3 {np.dtype(dtype).name:8s} {algo}: FAIL {type(e).__name__}")
                    continue
                name = "bf16" if dtype is jnp.bfloat16 else "f32"
                print(f"  {m}^3 {name:4s} {algo:9s}: {dt*1e3:8.3f} ms "
                      f"{flops/dt/1e12:8.2f} TFLOPS")


if __name__ == "__main__":
    main()

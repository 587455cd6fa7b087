"""Tile sweep for the Pallas block-tiled matmul.

Round-3 finding: the harness's ``out[0, 0]`` consumption let XLA
slice-simplify ``jnp.dot`` (fake TFLOPS), and with an honest harness the
``optimized`` kernel measured SLOWER than ``naive`` at every shape.
This sweep finds tile shapes that actually win.  Consumption is
``jnp.max(out)`` — a full-output reduction XLA cannot shortcut.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bm25_tpu.ops.matmul import matmul


def device_time(fn, *args, iters=30, reps=5):
    def looped(n):
        @jax.jit
        def f(*a):
            def body(i, acc):
                out = fn(a[0] + acc * 0, *a[1:])
                return jnp.max(out).astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0))

        return f

    f1, fn_ = looped(1), looped(iters)
    float(f1(*args)); float(fn_(*args))
    t1 = min(_t(f1, args) for _ in range(reps))
    tn = min(_t(fn_, args) for _ in range(reps))
    return max((tn - t1) / (iters - 1), 1e-9)


def _t(f, args):
    t0 = time.perf_counter()
    float(f(*args))
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    for m in (1028, 2048, 4096):
        a = jax.device_put(rng.random((m, m), dtype=np.float32))
        b = jax.device_put(rng.random((m, m), dtype=np.float32))
        flops = m * m * (2 * m - 1)

        dt = device_time(lambda x, y: jnp.dot(
            x, y, preferred_element_type=jnp.float32), a, b)
        print(f"{m}^3 xla(jnp.dot):      {dt*1e3:8.3f} ms {flops/dt/1e12:7.2f} TFLOPS",
              flush=True)
        try:
            dt = device_time(lambda x, y: matmul(x, y, algorithm="naive"), a, b)
            print(f"{m}^3 naive(default):   {dt*1e3:8.3f} ms {flops/dt/1e12:7.2f} TFLOPS",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{m}^3 naive(default):   FAIL {type(e).__name__}", flush=True)

        for tm, tn, tk in ((256, 256, 512), (512, 512, 512), (128, 512, 512),
                           (256, 512, 1024), (512, 1024, 512),
                           (512, 256, 2048), (1024, 512, 512)):
            try:
                dt = device_time(
                    lambda x, y, c=(tm, tn, tk): matmul(
                        x, y, algorithm="optimized",
                        tile_m=c[0], tile_n=c[1], tile_k=c[2]), a, b)
                print(f"{m}^3 opt({tm},{tn},{tk}): {dt*1e3:8.3f} ms "
                      f"{flops/dt/1e12:7.2f} TFLOPS", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{m}^3 opt({tm},{tn},{tk}): FAIL {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()

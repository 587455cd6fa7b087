"""Round-4 item 2, step 2: tile sweep driven by the HBM-traffic model.

exp_r4_matmul_precision.py showed the optimized kernel is NOT precision-
bound (its in-kernel f32 dot already lowers to one bf16 MXU pass — same
max_rel_err as the XLA dot) — it is HBM-bound.  Traffic model at M=N=K:

    bytes = M*K*4*(N/tn) + K*N*4*(M/tm) + M*N*4

so reuse is maximized by SQUARE (tm, tn) output tiles, not the round-3
(1024, 512) sweep winner whose model sat at 832 MB for 4096^3 (1.02 ms
at 819 GB/s — exactly the measured 1.3 ms step minus overhead).  With
(1024, 1024, 256) the model drops to 576 MB -> ~0.70 ms ~= the XLA dot.

Sweeps (tm, tn, tk) under the ~16 MB/core VMEM budget with the
dependency-chained harness from bench/matmul_bench.py (iters=2048-class,
probe-consumed — the round-3-validated methodology).

Run on-chip: python scripts/exp_r4_matmul_tiles2.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from bm25_tpu.bench.matmul_bench import _device_time
from bm25_tpu.ops.matmul import matmul


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1028, 2048, 4096])
    ap.add_argument("--iters", type=int, default=512)
    args = ap.parse_args()

    cands = [
        (1024, 1024, 256),
        (1024, 1024, 512),
        (512, 1024, 256),
        (1024, 512, 512),   # round-3 choice (control)
        (512, 512, 1024),
        (256, 512, 2048),
        (512, 512, 2048),
    ]
    for s in args.sizes:
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((s, s), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((s, s), dtype=np.float32))
        flops = float(s) * s * (2 * s - 1)

        dt = _device_time(a, b, "xla", args.iters)
        print(f"[sweep] {s}^3 xla                  "
              f"{flops/dt/1e12:7.1f} TFLOPS ({dt*1e3:7.3f} ms)", flush=True)
        dt = _device_time(a, b, "optimized", args.iters)
        print(f"[sweep] {s}^3 optimized(auto r3)   "
              f"{flops/dt/1e12:7.1f} TFLOPS ({dt*1e3:7.3f} ms)", flush=True)
        for tm, tn, tk in cands:
            if tm > s * 1.5 or tn > s * 1.5 or tk > s * 1.5:
                continue
            fn = lambda a, b: matmul(a, b, "optimized", tile_m=tm,  # noqa: E731
                                     tile_n=tn, tile_k=tk)
            # reuse the harness via a registered-op-free wrapper: inline
            # the chained loop (same structure as _device_time)
            from jax import lax

            def looped(n):
                @jax.jit
                def f(a, b):
                    def body(i, acc):
                        out = fn(a + acc * 0, b)
                        return jnp.max(out).astype(jnp.float32)

                    return lax.fori_loop(0, n, body, jnp.float32(0))

                return f

            f1, fn_ = looped(1), looped(args.iters)
            try:
                float(f1(a, b))
            except Exception as e:  # VMEM overflow etc.
                print(f"[sweep] {s}^3 ({tm},{tn},{tk}): FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            float(fn_(a, b))

            def timed(g):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(g(a, b))
                    best = min(best, time.perf_counter() - t0)
                return best

            t1, tn_t = timed(f1), timed(fn_)
            dt = max((tn_t - t1) / (args.iters - 1), 1e-9)
            print(f"[sweep] {s}^3 ({tm:4d},{tn:4d},{tk:4d})    "
                  f"{flops/dt/1e12:7.1f} TFLOPS ({dt*1e3:7.3f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()

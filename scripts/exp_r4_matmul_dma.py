"""Round-4 item 2, step 5: hand-pipelined B-resident matmul.

tiles4's b_resident (Mosaic auto-pipeline, B fully VMEM-resident,
A streamed in strips) plateaus at 113 TFLOPS @2048^3 — well under the
~197 TFLOPS compute bound, so the auto-pipeline is not hiding the A/C
traffic.  This variant drives the A-strip DMAs by hand (2-slot double
buffer, pltpu.make_async_copy, DMA semaphores) so strip i+1's HBM read
overlaps strip i's MXU dot, and writes C strip-by-strip from VMEM.

Fits when B + C + 2 A-strips <= ~100 MB VMEM: 2048^3 yes (16.8 + 16.8 +
2x2 MB), 4096^3 no (B alone 67 MB).  Targets the 2048-class mid sizes
where the XLA dot's chained-harness advantage (cross-iteration B
residency) is otherwise unanswerable.

Run on-chip: python scripts/exp_r4_matmul_dma.py
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from bm25_tpu.ops.matmul import _pad2


def _dma_kernel(a_hbm, b_ref, o_ref, *, tm: int, n_strips: int):
    """A in HBM (manually streamed), B/O VMEM-resident."""

    def body(a_buf, sem):
        def get(slot, i):
            return pltpu.make_async_copy(
                a_hbm.at[pl.ds(i * tm, tm), :],
                a_buf.at[slot],
                sem.at[slot],
            )

        get(0, 0).start()

        def step(i, _):
            slot = i % 2

            @pl.when(i + 1 < n_strips)
            def _():
                get((i + 1) % 2, i + 1).start()

            get(slot, i).wait()
            o_ref[pl.ds(i * tm, tm), :] = jnp.dot(
                a_buf[slot], b_ref[:], preferred_element_type=jnp.float32
            )
            return 0

        lax.fori_loop(0, n_strips, step, 0)

    pl.run_scoped(
        body,
        a_buf=pltpu.VMEM((2, tm, a_hbm.shape[1]), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("tm", "vmem_mb"))
def mm_dma(a, b, tm=256, vmem_mb=110):
    m, k = a.shape
    _, n = b.shape
    ap, bp = _pad2(a, tm, 128), _pad2(b, 128, 128)
    kp, np_ = bp.shape
    n_strips = ap.shape[0] // tm
    out = pl.pallas_call(
        functools.partial(_dma_kernel, tm=tm, n_strips=n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # A stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # B resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ap.shape[0], np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20,
        ),
    )(ap, bp)
    return out[:m, :n]


def device_time(fn, a, b, iters, reps=3):
    def looped(n):
        @jax.jit
        def f(a, b):
            def body(i, acc):
                out = fn(a + acc * 0, b)
                return jnp.max(out).astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0))

        return f

    f1, fn_ = looped(1), looped(iters)
    float(f1(a, b))
    float(fn_(a, b))

    def timed(g):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(a, b))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tn = timed(f1), timed(fn_)
    return max((tn - t1) / (iters - 1), 1e-9)


def main():
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--sizes", type=int, nargs="+", default=[1028, 2048])
    ap_.add_argument("--iters", type=int, default=512)
    args = ap_.parse_args()

    for s in args.sizes:
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((s, s), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((s, s), dtype=np.float32))
        flops = float(s) * s * (2 * s - 1)
        dt = device_time(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
            a, b, args.iters)
        print(f"[dma] {s}^3 xla                 {flops/dt/1e12:7.1f} TFLOPS "
              f"({dt*1e3:7.3f} ms)", flush=True)
        want = np.asarray(jnp.dot(a, b, preferred_element_type=jnp.float32))
        for tm in (256, 512):
            try:
                got = np.asarray(mm_dma(a, b, tm=tm))
            except Exception as e:
                print(f"[dma] {s}^3 tm={tm}: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
                continue
            if not np.allclose(got, want, rtol=2e-2, atol=2e-2):
                print(f"[dma] {s}^3 tm={tm}: WRONG RESULT", flush=True)
                continue
            dt = device_time(
                lambda a, b, tm=tm: mm_dma(a, b, tm=tm), a, b, args.iters)
            print(f"[dma] {s}^3 dma(tm={tm})        "
                  f"{flops/dt/1e12:7.1f} TFLOPS ({dt*1e3:7.3f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()

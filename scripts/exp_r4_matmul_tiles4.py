"""Round-4 item 2, step 4: operand-resident schedules.

tiles3 found (a) noacc(1024,1024,512) = 138.6 TFLOPS at 4096^3 (71% of
XLA — target met there) and (b) Mosaic compiles kernels whose VMEM
footprint far exceeds the 16 MB planning number when
vmem_limit_bytes is raised (v5e VMEM is physically 128 MB) — which
unlocks the schedule XLA itself uses at mid sizes: keep ONE operand
fully VMEM-resident and stream the other exactly once.

Variants:
  b_resident(tm)   grid over M only; B (K, N) fully resident, A streamed
                   in (tm, K) strips, C written once.  HBM traffic =
                   A + B + C exactly once (the floor).
  single_dot       grid (1,): one in-kernel jnp.dot over whole padded
                   operands (1028^3: 5.3 MB each).

Run on-chip: python scripts/exp_r4_matmul_tiles4.py
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
from bm25_tpu.utils.padding import next_multiple


def _strip_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tm", "vmem_mb"))
def mm_b_resident(a, b, tm, vmem_mb=100):
    m, k = a.shape
    _, n = b.shape
    ap, bp = _pad2(a, tm, 128), _pad2(b, 128, 128)
    kp, np_ = bp.shape
    out = pl.pallas_call(
        _strip_kernel,
        grid=(ap.shape[0] // tm,),
        in_specs=[
            pl.BlockSpec((tm, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, np_), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ap.shape[0], np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_mb << 20,
        ),
    )(ap, bp)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("vmem_mb",))
def mm_single_dot(a, b, vmem_mb=100):
    m, k = a.shape
    _, n = b.shape
    ap, bp = _pad2(a, 8, 128), _pad2(b, 128, 128)
    out = pl.pallas_call(
        _strip_kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(ap.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ap.shape[0], bp.shape[1]),
                               lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ap.shape[0], bp.shape[1]),
                                       jnp.float32),
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

    t1, tn_t = timed(f1), timed(fn_)
    return max((tn_t - t1) / (iters - 1), 1e-9)


def run_variant(label, fn, a, b, s, iters):
    flops = float(s) * s * (2 * s - 1)
    try:
        got = np.asarray(jax.jit(fn)(a[:64], b))
    except Exception as e:
        print(f"[t4] {s}^3 {label}: FAIL {type(e).__name__}: "
              f"{str(e)[:140]}", flush=True)
        return
    want = np.asarray(jnp.dot(a[:64], b, preferred_element_type=jnp.float32))
    if not np.allclose(got, want, rtol=2e-2, atol=2e-2):
        print(f"[t4] {s}^3 {label}: WRONG RESULT", flush=True)
        return
    dt = device_time(fn, a, b, iters)
    print(f"[t4] {s}^3 {label:26s} {flops/dt/1e12:7.1f} TFLOPS "
          f"({dt*1e3:7.3f} ms)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1028, 2048, 4096])
    ap.add_argument("--iters", type=int, default=256)
    args = ap.parse_args()

    for s in args.sizes:
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((s, s), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((s, s), dtype=np.float32))
        flops = float(s) * s * (2 * s - 1)
        dt = device_time(lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32), a, b, args.iters)
        print(f"[t4] {s}^3 xla                        "
              f"{flops/dt/1e12:7.1f} TFLOPS ({dt*1e3:7.3f} ms)", flush=True)
        if s <= 1600:
            run_variant("single_dot", lambda a, b: mm_single_dot(a, b),
                        a, b, s, args.iters)
        for tm in (256, 512, 1024):
            for vm in (100, 120):
                bbytes = next_multiple(s, 128) ** 2 * 4
                strips = 2 * tm * next_multiple(s, 128) * 4 * 2 * 2
                if bbytes + strips > (vm << 20):
                    continue
                run_variant(
                    f"b_resident(tm={tm},vmem={vm})",
                    lambda a, b, tm=tm, vm=vm: mm_b_resident(
                        a, b, tm, vmem_mb=vm),
                    a, b, s, args.iters)


if __name__ == "__main__":
    main()

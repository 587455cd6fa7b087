"""Round-4 item 2, step 3: no-scratch accumulation + VMEM-limit sweep.

tiles2 found square (1024,1024,256) tiles reach 131.8 TFLOPS at 4096^3
(67.6% of the XLA dot) and that (1024,1024,512) dies in compile — the
f32 acc scratch doubles the output block's VMEM.  Variants here:

  noacc     accumulate directly into o_ref (out IS f32; index_map is
            constant over k so the block stays resident) — frees
            tm*tn*4 bytes, admitting tk=512 and (2048,1024) tiles
  vmem=N    pltpu.CompilerParams(vmem_limit_bytes=N) — the Mosaic
            default budget is conservative; v5e VMEM is physically
            larger than the 16 MB planning number
  resident  one grid cell over (M, N), K streamed: for sizes whose
            padded (M, N) output fits VMEM (1028^3), the whole C stays
            on-chip and A/B stream exactly once — the schedule XLA uses
            there (its 1028^3 number additionally keeps A/B VMEM-
            resident ACROSS chained bench iterations, which a pallas
            kernel with HBM inputs cannot express; flagged in NOTES)

Run on-chip: python scripts/exp_r4_matmul_tiles3.py
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


def _noacc_kernel(a_ref, b_ref, o_ref, *, k_steps):
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk", "vmem_mb"))
def mm_noacc(a, b, tm, tn, tk, vmem_mb=None):
    ap, bp = _pad2(a, tm, tk), _pad2(b, tk, tn)
    k_steps = ap.shape[1] // tk
    grid = (ap.shape[0] // tm, bp.shape[1] // tn, k_steps)
    params = {}
    if vmem_mb:
        params["vmem_limit_bytes"] = vmem_mb << 20
    out = pl.pallas_call(
        functools.partial(_noacc_kernel, k_steps=k_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ap.shape[0], bp.shape[1]),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **params,
        ),
    )(ap, bp)
    return out[: a.shape[0], : b.shape[1]]


@functools.partial(jax.jit, static_argnames=("tk", "vmem_mb"))
def mm_resident(a, b, tk, vmem_mb=None):
    """One grid cell over (M, N); K streamed in tk strips; C resident."""
    m, k = a.shape
    _, n = b.shape
    mp, np_ = next_multiple(m, 8), next_multiple(n, 128)
    ap, bp = _pad2(a, 8, tk), _pad2(b, tk, 128)
    k_steps = ap.shape[1] // tk
    params = {}
    if vmem_mb:
        params["vmem_limit_bytes"] = vmem_mb << 20
    out = pl.pallas_call(
        functools.partial(_noacc_kernel, k_steps=k_steps),
        grid=(1, 1, k_steps),
        in_specs=[
            pl.BlockSpec((mp, tk), lambda i, j, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, np_), lambda i, j, kk: (kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, np_), lambda i, j, kk: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **params,
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
        print(f"[t3] {s}^3 {label}: FAIL {type(e).__name__}: "
              f"{str(e)[:140]}", flush=True)
        return
    want = np.asarray(jnp.dot(a[:64], b, preferred_element_type=jnp.float32))
    if not np.allclose(got, want, rtol=2e-2, atol=2e-2):
        print(f"[t3] {s}^3 {label}: WRONG RESULT", flush=True)
        return
    dt = device_time(fn, a, b, iters)
    print(f"[t3] {s}^3 {label:28s} {flops/dt/1e12:7.1f} TFLOPS "
          f"({dt*1e3:7.3f} ms)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1028, 2048, 4096])
    ap.add_argument("--iters", type=int, default=512)
    args = ap.parse_args()

    for s in args.sizes:
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((s, s), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((s, s), dtype=np.float32))
        flops = float(s) * s * (2 * s - 1)
        dt = device_time(lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32), a, b, args.iters)
        print(f"[t3] {s}^3 xla                          "
              f"{flops/dt/1e12:7.1f} TFLOPS ({dt*1e3:7.3f} ms)", flush=True)

        if s <= 1600:
            for tk in (256, 512, 1152):
                for vm in (None, 100):
                    run_variant(
                        f"resident(tk={tk},vmem={vm})",
                        lambda a, b, tk=tk, vm=vm: mm_resident(
                            a, b, tk=tk, vmem_mb=vm),
                        a, b, s, args.iters)
        combos = [
            (1024, 1024, 256, None),
            (1024, 1024, 512, None),
            (1024, 1024, 512, 100),
            (1024, 1024, 1024, 100),
            (2048, 1024, 256, 100),
            (1024, 2048, 256, 100),
            (2048, 1024, 512, 100),
            (2048, 2048, 256, 100),
        ]
        for tm, tn, tk, vm in combos:
            if tm > s * 1.2 or tn > s * 1.2 or tk > s * 1.2:
                continue
            run_variant(
                f"noacc({tm},{tn},{tk},vmem={vm})",
                lambda a, b, tm=tm, tn=tn, tk=tk, vm=vm: mm_noacc(
                    a, b, tm, tn, tk, vmem_mb=vm),
                a, b, s, args.iters)


if __name__ == "__main__":
    main()

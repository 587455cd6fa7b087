"""Round-4 item 2: why the Pallas optimized matmul trails the XLA dot.

Hypothesis: the in-kernel f32 ``jnp.dot`` lowers at full f32 precision
(multi-pass bf16 emulation on the MXU), while ``jnp.dot`` under XLA uses
DEFAULT precision = ONE bf16 pass per input — so the round-3 comparison
(47.7/114/105 vs 138/198/186 TFLOPS) compared a high-precision kernel
against a low-precision one.  v5e MXU peak is ~394 TFLOPS bf16 / ~half
that per extra pass, so precision IS the 2x.

Variants per size (1028^3, 2048^3, 4096^3), all with f32 accumulate:

  pallas_f32      current `optimized` kernel (baseline)
  pallas_default  in-kernel dot with precision=DEFAULT
  pallas_bf16in   inputs cast to bf16 in-kernel before the dot
  xla_default     jnp.dot (what the bench compares against)
  xla_highest     jnp.dot precision=HIGHEST (the equal-precision rival
                  of pallas_f32)

Also reports max|err| vs a float64 NumPy product so the speed/precision
pairing is explicit.

Run on-chip: python scripts/exp_r4_matmul_precision.py [--sizes ...]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bm25_tpu.ops.matmul import _auto_tile, _pad2
from bm25_tpu.utils.padding import next_multiple


def _tiled_kernel(a_ref, b_ref, o_ref, acc_ref, *, k_steps, mode):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a, b = a_ref[:], b_ref[:]
    if mode == "bf16in":
        a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(a, b, preferred_element_type=jnp.float32)
    elif mode == "default":
        acc_ref[:] += jnp.dot(a, b, preferred_element_type=jnp.float32,
                              precision=lax.Precision.DEFAULT)
    else:  # f32 (current kernel)
        acc_ref[:] += jnp.dot(a, b, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "tile_m", "tile_n",
                                             "tile_k"))
def pallas_matmul(a, b, mode="f32", tile_m=None, tile_n=None, tile_k=None):
    m, k = a.shape
    _, n = b.shape
    tm = min(next_multiple(m, 8), tile_m or _auto_tile(m, (1024, 512, 256)))
    tn = min(next_multiple(n, 128), tile_n or _auto_tile(n, (512, 256)))
    if tile_k is None:
        full_k = next_multiple(k, 128)
        isz = a.dtype.itemsize
        fixed = tm * tn * (4 + a.dtype.itemsize)
        tk = 512
        for c in (full_k, 2048, 1024):
            if c <= full_k and 2 * (tm + tn) * c * isz + fixed <= 12 << 20:
                tk = c
                break
    else:
        tk = tile_k
    tk = min(next_multiple(k, 128), tk)
    ap, bp = _pad2(a, tm, tk), _pad2(b, tk, tn)
    k_steps = ap.shape[1] // tk
    grid = (ap.shape[0] // tm, bp.shape[1] // tn, k_steps)
    out = pl.pallas_call(
        functools.partial(_tiled_kernel, k_steps=k_steps, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ap.shape[0], bp.shape[1]), a.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(ap, bp)
    return out[:m, :n]


def device_time(fn, a, b, iters=None, reps=3):
    if iters is None:
        iters = 64 if jax.devices()[0].platform == "tpu" else 4

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1028, 2048, 4096])
    ap.add_argument("--iters", type=int, default=None)
    args = ap.parse_args()

    for s in args.sizes:
        rng = np.random.default_rng(0)
        a_h = rng.standard_normal((s, s), dtype=np.float32)
        b_h = rng.standard_normal((s, s), dtype=np.float32)
        want = (a_h[: 128].astype(np.float64) @ b_h.astype(np.float64))
        a, b = jnp.asarray(a_h), jnp.asarray(b_h)
        flops = 2.0 * s * s * s

        variants = {
            "pallas_f32": lambda a, b: pallas_matmul(a, b, mode="f32"),
            "pallas_default": lambda a, b: pallas_matmul(a, b, mode="default"),
            "pallas_bf16in": lambda a, b: pallas_matmul(a, b, mode="bf16in"),
            "xla_default": lambda a, b: jnp.dot(
                a, b, preferred_element_type=jnp.float32),
            "xla_highest": lambda a, b: jnp.dot(
                a, b, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST),
        }
        for name, fn in variants.items():
            out = np.asarray(jax.jit(fn)(a, b))[:128].astype(np.float64)
            err = float(np.max(np.abs(out - want) / (np.abs(want) + 1e-6)))
            dt = device_time(fn, a, b, iters=args.iters)
            print(f"[mm] {s}^3 {name:15s} {flops/dt/1e12:7.1f} TFLOPS "
                  f"({dt*1e3:7.3f} ms)  max_rel_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()

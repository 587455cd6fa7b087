"""Matmul kernels: naive and block-tiled Pallas implementations + XLA path.

Mirrors the reference's matmul custom-op family
(``/root/reference/operations/matrix_multiplication.mojo``):

* ``naive``      one grid cell computes one (tile_m, tile_n) output tile with
                 the full K in VMEM (the TPU analog of the reference's
                 1-thread-per-element kernel, ``matrix_multiplication.mojo:55``)
* ``optimized``  the analog of the shared-memory/register-tiled kernel
                 (``:119-231``), as a measured per-shape schedule family:
                 whole-C-resident K-streaming for small f32 outputs,
                 no-scratch square-tiled (M, N, K) accumulation into the
                 f32 output block at large sizes, and the classic
                 f32-scratch block tiling for narrow output dtypes
                 (sweeps: scripts/exp_matmul_tiles.py, exp_r4_matmul_
                 tiles{2,3,4}.py)
* ``xla``        plain ``jnp.dot`` — the production path; the Pallas kernels
                 exist to match (and are benchmarked against) it.

All paths use the MXU via ``preferred_element_type=float32``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bm25_tpu.ops.registry import register_op
from bm25_tpu.utils.padding import next_multiple


def _pad2(x, m, n):
    pm, pn = next_multiple(x.shape[0], m), next_multiple(x.shape[1], n)
    if (pm, pn) != x.shape:
        x = jnp.pad(x, ((0, pm - x.shape[0]), (0, pn - x.shape[1])))
    return x


def _auto_tile(dim: int, candidates: tuple[int, ...]) -> int:
    """Largest tile with <= 12.5% pad waste, else the least-padding one.

    Tile choice is a padded-FLOPs vs MXU-efficiency trade (measured sweep
    in scripts/exp_matmul_tiles.py: (1024, 512, 512) wins at 2048/4096
    cubed, but a 1024-wide N tile would DOUBLE the work at n=1028) — so
    prefer big tiles only when the padding they induce is small.
    """
    best = None
    for c in sorted(candidates, reverse=True):
        padded = next_multiple(dim, c)
        if padded <= dim * 1.125:
            return c
        if best is None or padded < best[0]:
            best = (padded, c)
    return best[1]


def _shrink_naive_tiles(tm: int, tn: int, kb: int, budget: int) -> tuple[int, int]:
    """Shrink (tm, tn) until double-buffered full-K strips fit ``budget``.

    Tiles stay Mosaic-legal for f32: sublane tiles are multiples of 8
    (floor 8), lane tiles multiples of 128 (floor 128) — a bare halving
    could land on e.g. tm=6 and fail to compile on hardware.
    """

    def strip_bytes(tm_, tn_):
        return 2 * (tm_ * kb + kb * tn_ + tm_ * tn_ * 4)

    while strip_bytes(tm, tn) > budget and tm > 8:
        tm = max(8, next_multiple(tm // 2, 8))
    while strip_bytes(tm, tn) > budget and tn > 128:
        tn = max(128, next_multiple(tn // 2, 128))
    return tm, tn


def _naive_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _tiled_kernel(a_ref, b_ref, o_ref, acc_ref, *, k_steps):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _noacc_kernel(a_ref, b_ref, o_ref, *, k_axis=2):
    """K-innermost accumulation straight into the f32 output block.

    The output index_map is constant over the K grid axis (``k_axis``),
    so Mosaic keeps the block VMEM-resident across the K steps and
    writes it to HBM once — dropping the acc scratch frees tm*tn*4
    bytes, which is what admits the square (1024, 1024, 512) tiling
    (138.6 TFLOPS at 4096^3 vs 105 with the scratch variant; scripts/
    exp_r4_matmul_tiles3.py).  f32 outputs only — a narrower o_ref
    would accumulate in the narrow dtype.

    With ``k_axis=0`` this is the whole-C-resident schedule: a 1-cell
    (M, N) grid with K streamed, A and B read exactly once (the HBM
    traffic floor), C never round-tripping.  Needs an explicit
    vmem_limit_bytes above Mosaic's conservative default — v5e VMEM is
    physically 128 MB.  Measured 77.9 TFLOPS at 1028^3 vs 47.7 for the
    tiled variant (scripts/exp_r4_matmul_tiles3.py).
    """
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(k_axis) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("algorithm", "tile_m", "tile_n", "tile_k"))
def matmul(
    a: jax.Array,
    b: jax.Array,
    algorithm: str = "optimized",
    tile_m: int | None = None,
    tile_n: int | None = None,
    tile_k: int | None = None,
) -> jax.Array:
    """C = A @ B with a selectable kernel (reference graph.py:24 semantics).

    Tiles default to an auto choice (``_auto_tile``) that reproduces the
    measured sweep optimum (scripts/exp_matmul_tiles.py): (1024, 512, 512)
    at MXU-aligned sizes, smaller tiles when padding would dominate.
    """
    if a.ndim != 2 or b.ndim != 2 or a.shape[1] != b.shape[0]:
        raise ValueError(f"incompatible shapes {a.shape} @ {b.shape}")
    if algorithm == "xla":
        return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = a.shape
    _, n = b.shape
    interpret = jax.devices()[0].platform != "tpu"

    if algorithm == "naive":
        tm = min(next_multiple(m, 8), tile_m or 256)
        tn = min(next_multiple(n, 128), tile_n or 256)
        # full-K strips must fit VMEM with Pallas double-buffering; shrink
        # the tile until ~2x the live blocks stay under budget (fixes an
        # HBM/VMEM OOM first seen at 4096^3: 2 x (4 MB + 4 MB) strips)
        kb = next_multiple(k, 128) * a.dtype.itemsize
        tm, tn = _shrink_naive_tiles(tm, tn, kb, budget=10 << 20)
        ap = _pad2(a, tm, 1)
        bp = _pad2(b, 1, tn)
        grid = (ap.shape[0] // tm, bp.shape[1] // tn)
        out = pl.pallas_call(
            _naive_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((ap.shape[0], bp.shape[1]), a.dtype),
            interpret=interpret,
        )(ap, bp)
        return out[:m, :n]

    if algorithm == "optimized":
        out_f32 = a.dtype == jnp.float32
        mp, np_, kp = (next_multiple(m, 8), next_multiple(n, 128),
                       next_multiple(k, 128))
        isz = a.dtype.itemsize

        # whole-C-resident schedule for small f32 outputs (no tile
        # overrides): the measured winner at the reference's 1028^3
        # headline shape (77.9 vs 47.7 TFLOPS tiled — exp_r4_matmul_
        # tiles3.py).  C stays in VMEM across the K stream, A/B are
        # read exactly once.
        if (out_f32 and tile_m is None and tile_n is None and tile_k is None
                and mp * np_ * 4 <= 8 << 20):
            tk = kp
            while (mp * np_ * 4 + 2 * (mp + np_) * tk * isz > 90 << 20
                   and tk > 512):
                tk = max(512, next_multiple(tk // 2, 128))
            resident_fits = (
                mp * np_ * 4 + 2 * (mp + np_) * tk * isz <= 90 << 20
            )
        else:
            resident_fits = False
        if resident_fits:
            # skinny-M/wide-N shapes (e.g. (8, 25600+) outputs) pass the
            # 8 MB output gate but their double-buffered full-width K
            # strips exceed VMEM at any tk — those fall through to the
            # block-tiled path below instead of a Mosaic compile error
            ap = _pad2(a, 8, tk)
            bp = _pad2(b, tk, 128)
            k_steps = ap.shape[1] // tk
            out = pl.pallas_call(
                functools.partial(_noacc_kernel, k_axis=0),
                grid=(k_steps,),
                in_specs=[
                    pl.BlockSpec((mp, tk), lambda kk: (0, kk),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tk, np_), lambda kk: (kk, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((mp, np_), lambda kk: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=100 << 20,
                ),
                interpret=interpret,
            )(ap, bp)
            return out[:m, :n]

        # block-tiled path.  f32 outputs accumulate straight into o_ref
        # (no scratch) — frees tm*tn*4 bytes of VMEM, admitting square
        # (1024, 1024) output tiles, the measured optimum at large
        # aligned sizes (138.6 TFLOPS at 4096^3 = 71% of the XLA dot).
        tm = min(mp, tile_m or _auto_tile(m, (1024, 512, 256)))
        tn = min(np_, tile_n or _auto_tile(n, (1024, 512, 256) if out_f32
                                           else (512, 256)))
        if tile_k is None:
            # K-splitting costs accumulator revisits; prefer the largest
            # K tile (ideally all of K: k_steps=1, no accumulation loop)
            # whose double-buffered a/b blocks + resident out (+ acc
            # scratch on the narrow-dtype path) fit VMEM
            fixed = tm * tn * (4 if out_f32 else 4 + isz)
            tk = 512
            for c in (kp, 2048, 1024):
                if c <= kp and 2 * (tm + tn) * c * isz + fixed <= 13 << 20:
                    tk = c
                    break
        else:
            tk = tile_k
        tk = min(kp, tk)
        ap = _pad2(a, tm, tk)
        bp = _pad2(b, tk, tn)
        k_steps = ap.shape[1] // tk
        grid = (ap.shape[0] // tm, bp.shape[1] // tn, k_steps)
        kernel = (_noacc_kernel if out_f32
                  else functools.partial(_tiled_kernel, k_steps=k_steps))
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((ap.shape[0], bp.shape[1]), a.dtype),
            scratch_shapes=(
                [] if out_f32 else [pltpu.VMEM((tm, tn), jnp.float32)]
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * ap.shape[0] * bp.shape[1] * ap.shape[1],
                bytes_accessed=(
                    ap.size * ap.dtype.itemsize
                    + bp.size * bp.dtype.itemsize
                    + ap.shape[0] * bp.shape[1] * 4
                ),
                transcendentals=0,
            ),
            interpret=interpret,
        )(ap, bp)
        return out[:m, :n]

    raise ValueError(f"unknown algorithm {algorithm!r}")


register_op("matrix_multiplication")(matmul)

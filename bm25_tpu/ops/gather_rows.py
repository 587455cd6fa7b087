"""Pallas fused gather-accumulate: out[q] = sum_t table[ids[q, t]].

The BM25 dense-scoring primitive (gather token rows + accumulate), written
as a TPU Pallas kernel with scalar-prefetched indices: the grid walks
(query, doc-block, token) and the BlockSpec index_map reads the prefetched
token id to DMA exactly the needed (1, block) row slice HBM->VMEM — one
streaming pass at HBM bandwidth, instead of XLA's generic dynamic-gather.
The output block stays VMEM-resident across the token axis (fastest grid
dim), so accumulation is free.

Functional counterpart of the reference's fused ``gather_reduce``
(EmbeddingBag-style, ``/root/reference/operations/gather_scatter.mojo:
116-281``), re-invented for the TPU memory hierarchy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bm25_tpu.ops.registry import register_op
from bm25_tpu.utils.padding import cdiv, next_multiple

# col-block cap: (1, 8, 256, 128) f32 = 1 MiB per buffer, double-buffered
# in + out well inside the ~16 MiB VMEM budget
_MAX_CB = 256


def _col_blocks(d: int) -> tuple[int, int]:
    """(cb, nc): balanced (8, cb, 128) col-block split for d doc columns.

    nc is the fewest blocks that respect the VMEM cap; cb then balances
    them so the padding waste is < nc tiles (a fixed cb=_MAX_CB would pad
    d to 256-tile multiples — up to 262143 wasted doc columns per row).
    """
    c = next_multiple(max(d, 1), 8 * 128) // (8 * 128)
    nc = cdiv(c, _MAX_CB)
    cb = cdiv(c, nc)
    return cb, nc


def doc_pad(d: int) -> int:
    """The kernel's REAL doc-column padding quantum for d docs.

    Callers that keep a padded table resident (DenseEngine, the sharded
    dense shards) must pad to THIS width — anything else makes the kernel
    re-pad the whole (V, D) table inside every jitted query step.
    """
    cb, nc = _col_blocks(d)
    return nc * cb * 8 * 128


@functools.partial(jax.jit, static_argnames=("interpret", "weighted"))
def _gather_add_rows_pallas(table: jax.Array, ids: jax.Array, interpret: bool,
                            weights: jax.Array | None = None,
                            weighted: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, t = ids.shape
    v, d = table.shape
    if q == 0 or t == 0:
        # a zero-size grid never runs the kernel, leaving the output
        # buffer uninitialized garbage; the contract (and the lax path)
        # is zeros
        return jnp.zeros((q, d), table.dtype)
    # view each row as a full (8, C, 128) sublane-packed tile so the per-row
    # DMA fills all 8 sublanes (a (1, N) block would use 1 of 8 — 8x slower)
    cb, nc = _col_blocks(d)
    c_pad = nc * cb
    d_pad = c_pad * 8 * 128
    if d_pad != d:
        table = jnp.pad(table, ((0, 0), (0, d_pad - d)))
    t4 = table.reshape(v, 8, c_pad, 128)

    if weighted:
        # per-(query, token) scalar weight rides as a second scalar-prefetch
        # operand (SMEM), read by grid position; weighting costs one VPU
        # multiply on the accumulate
        def kernel(ids_ref, w_ref, st_ref, out_ref):
            qi, tt = pl.program_id(0), pl.program_id(2)
            w = w_ref[qi * t + tt]

            @pl.when(tt == 0)
            def _():
                out_ref[:] = w * st_ref[:]

            @pl.when(tt > 0)
            def _():
                out_ref[:] += w * st_ref[:]

        num_prefetch = 2
        in_specs = [
            pl.BlockSpec(
                (1, 8, cb, 128),
                lambda qi, ci, ti, ids_ref, w_ref: (
                    ids_ref[qi * t + ti], 0, ci, 0
                ),
            ),
        ]
        args = (ids.reshape(-1), weights.reshape(-1).astype(table.dtype), t4)
        out_spec = pl.BlockSpec(
            (1, 8, cb, 128), lambda qi, ci, ti, ids_ref, w_ref: (qi, 0, ci, 0)
        )
    else:
        def kernel(ids_ref, st_ref, out_ref):
            tt = pl.program_id(2)

            @pl.when(tt == 0)
            def _():
                out_ref[:] = st_ref[:]

            @pl.when(tt > 0)
            def _():
                out_ref[:] += st_ref[:]

        num_prefetch = 1
        in_specs = [
            pl.BlockSpec(
                (1, 8, cb, 128),
                lambda qi, ci, ti, ids_ref: (ids_ref[qi * t + ti], 0, ci, 0),
            ),
        ]
        args = (ids.reshape(-1), t4)
        out_spec = pl.BlockSpec(
            (1, 8, cb, 128), lambda qi, ci, ti, ids_ref: (qi, 0, ci, 0)
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=num_prefetch,
            grid=(q, nc, t),
            in_specs=in_specs,
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((q, 8, c_pad, 128), table.dtype),
        interpret=interpret,
    )(*args)
    out = out.reshape(q, d_pad)
    return out[:, :d] if d_pad != d else out


def gather_add_rows(
    table: jax.Array, ids: jax.Array, implementation: str = "auto",
    weights: jax.Array | None = None,
) -> jax.Array:
    """Sum of gathered rows: (V, D) table, (Q, T) non-negative ids -> (Q, D).

    ``weights`` (Q, T), when given, scales each gathered row (weighted
    queries / dedup counts): out[q] = sum_t weights[q, t] * table[ids[q, t]].

    Padding contract: callers map pad/OOV ids to an all-zero row of the
    table (adding zero; with weights, zero the pad weights too) — ids here
    must be in-range.
    """
    if implementation == "auto":
        implementation = (
            "pallas" if jax.devices()[0].platform == "tpu" else "lax"
        )
    if implementation == "lax":
        if weights is None:
            def body(acc, ids_t):
                return acc + table[ids_t], None

            acc0 = jnp.zeros((ids.shape[0], table.shape[1]), table.dtype)
            acc, _ = jax.lax.scan(body, acc0, jnp.transpose(ids))
        else:
            def body(acc, xs):
                ids_t, w_t = xs
                return acc + w_t[:, None].astype(table.dtype) * table[ids_t], None

            acc0 = jnp.zeros((ids.shape[0], table.shape[1]), table.dtype)
            acc, _ = jax.lax.scan(
                body, acc0, (jnp.transpose(ids), jnp.transpose(weights))
            )
        return acc
    if implementation == "pallas":
        interpret = jax.devices()[0].platform != "tpu"
        return _gather_add_rows_pallas(
            table, ids, interpret, weights=weights, weighted=weights is not None
        )
    raise ValueError(f"unknown implementation {implementation!r}")


register_op("gather_add_rows")(gather_add_rows)

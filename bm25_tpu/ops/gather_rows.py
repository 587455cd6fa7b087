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
import numpy as np

from bm25_tpu.ops.registry import register_op
from bm25_tpu.utils.padding import cdiv, next_multiple

# per-row-slice VMEM budget: (1, DB) f32 double-buffered
_MAX_BLOCK_COLS = 65536


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_add_rows_pallas(table: jax.Array, ids: jax.Array, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, t = ids.shape
    v, d = table.shape
    # view rows as (lanes of 128) so per-row blocks satisfy the (8, 128)
    # tiling rule: table (V, D) -> (V, D/128, 128), block (1, C, 128)
    d_pad = next_multiple(d, 128)
    if d_pad != d:
        table = jnp.pad(table, ((0, 0), (0, d_pad - d)))
    lanes = d_pad // 128
    cb = min(next_multiple(lanes, 8), _MAX_BLOCK_COLS // 128)
    nd = cdiv(lanes, cb)
    lanes_pad = nd * cb
    if lanes_pad != lanes:
        table = jnp.pad(table, ((0, 0), (0, (lanes_pad - lanes) * 128)))
    t3 = table.reshape(v, lanes_pad, 128)

    def kernel(ids_ref, st_ref, out_ref):
        tt = pl.program_id(2)

        @pl.when(tt == 0)
        def _():
            out_ref[:] = st_ref[:]

        @pl.when(tt > 0)
        def _():
            out_ref[:] += st_ref[:]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(q, nd, t),
            in_specs=[
                pl.BlockSpec(
                    (1, cb, 128),
                    lambda qi, di, ti, ids_ref: (ids_ref[qi * t + ti], di, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, cb, 128), lambda qi, di, ti, ids_ref: (qi, di, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((q, lanes_pad, 128), table.dtype),
        interpret=interpret,
    )(ids.reshape(-1), t3)
    out = out.reshape(q, lanes_pad * 128)
    return out[:, :d] if lanes_pad * 128 != d else out


def gather_add_rows(
    table: jax.Array, ids: jax.Array, implementation: str = "auto"
) -> jax.Array:
    """Sum of gathered rows: (V, D) table, (Q, T) non-negative ids -> (Q, D).

    Padding contract: callers map pad/OOV ids to an all-zero row of the
    table (adding zero) — ids here must be in-range.
    """
    if implementation == "auto":
        implementation = (
            "pallas" if jax.devices()[0].platform == "tpu" else "lax"
        )
    if implementation == "lax":
        def body(acc, ids_t):
            return acc + table[ids_t], None

        acc0 = jnp.zeros((ids.shape[0], table.shape[1]), table.dtype)
        acc, _ = jax.lax.scan(body, acc0, jnp.transpose(ids))
        return acc
    if implementation == "pallas":
        interpret = jax.devices()[0].platform != "tpu"
        return _gather_add_rows_pallas(table, ids, interpret)
    raise ValueError(f"unknown implementation {implementation!r}")


register_op("gather_add_rows")(gather_add_rows)

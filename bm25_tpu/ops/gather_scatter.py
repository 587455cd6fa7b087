"""ONNX/torch-semantics gather & scatter op family + shape inference.

Functional re-creation of the reference's Mojo kernel set
(``/root/reference/operations/gather_scatter.mojo``) as XLA-lowered JAX ops:

* ``gather``           ONNX Gather: axis + negative-index normalization
                       (``gather_scatter.mojo:384-480``)
* ``gather_reduce``    fused gather+sum over multi-hot index rows
                       (EmbeddingBag style, ``gather_scatter.mojo:116-281``)
                       — the scoring primitive of the BM25 engines
* ``gather_elements``  torch.gather equivalent (``:1281-1327``)
* ``gather_nd``        ONNX GatherND with batch_dims (``:1410-1592``)
* ``scatter_elements`` torch.scatter with none/add/mul/max/min reduction
                       (``:1155-1216``)
* ``scatter_nd``       ONNX ScatterND (``:772-1011``)
* shape inference      ``gather_shape`` (``:1088``), ``scatter_nd_shape``
                       (``:1015``), ``gather_nd_shape`` (``:1336``)

On TPU these lower to XLA gather/scatter HLOs, which Mosaic/XLA tile onto
the VPU — the hand-written prefetch/SIMD machinery of the Mojo versions is
the compiler's job here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bm25_tpu.ops.registry import register_op


def _normalize_indices(indices: jax.Array, dim_size: int) -> jax.Array:
    """ONNX negative-index normalization: i < 0 -> i + dim_size."""
    return jnp.where(indices < 0, indices + dim_size, indices)


@register_op("gather")
def gather(data: jax.Array, indices: jax.Array, axis: int = 0) -> jax.Array:
    """ONNX Gather along ``axis`` with negative-index support."""
    axis = axis % data.ndim
    idx = _normalize_indices(jnp.asarray(indices), data.shape[axis])
    return jnp.take(data, idx, axis=axis)


@register_op("gather_reduce")
def gather_reduce(data: jax.Array, indices: jax.Array) -> jax.Array:
    """Fused gather + sum: for each index row, sum the gathered rows of data.

    ``data (N, *F)``, ``indices (*B, M)`` -> ``(*B, *F)``: EmbeddingBag-style
    multi-hot reduction (reference ``gather_reduce``,
    ``gather_scatter.mojo:116-281``).  Negative indices are padding and
    contribute zero (our unified pad contract).  This is exactly the BM25
    scoring primitive: data = token-major score matrix, indices = query ids.
    """
    indices = jnp.asarray(indices)
    valid = indices >= 0
    safe = jnp.where(valid, indices, 0)
    g = jnp.take(data, safe, axis=0)  # (*B, M, *F)
    mask = valid.reshape(valid.shape + (1,) * (data.ndim - 1))
    return jnp.sum(g * mask.astype(g.dtype), axis=indices.ndim - 1)


@register_op("gather_elements")
def gather_elements(data: jax.Array, indices: jax.Array, axis: int = 0) -> jax.Array:
    """torch.gather / ONNX GatherElements."""
    axis = axis % data.ndim
    idx = _normalize_indices(jnp.asarray(indices), data.shape[axis])
    return jnp.take_along_axis(data, idx, axis=axis)


@register_op("gather_nd")
def gather_nd(data: jax.Array, indices: jax.Array, batch_dims: int = 0) -> jax.Array:
    """ONNX GatherND: last indices dim indexes the leading dims of data."""
    indices = jnp.asarray(indices)
    r = indices.shape[-1]
    if batch_dims == 0:
        idx = tuple(jnp.moveaxis(indices, -1, 0))
        return data[idx]
    # vmap over batch dims
    fn = gather_nd
    for _ in range(batch_dims):
        fn = jax.vmap(fn, in_axes=(0, 0, None))
    return fn(data, indices, 0)


_REDUCTIONS = {
    "none": lambda ref, idx, upd: ref.at[idx].set(upd, mode="drop"),
    "add": lambda ref, idx, upd: ref.at[idx].add(upd, mode="drop"),
    "mul": lambda ref, idx, upd: ref.at[idx].multiply(upd, mode="drop"),
    "max": lambda ref, idx, upd: ref.at[idx].max(upd, mode="drop"),
    "min": lambda ref, idx, upd: ref.at[idx].min(upd, mode="drop"),
}


@register_op("scatter_elements")
def scatter_elements(
    data: jax.Array,
    indices: jax.Array,
    updates: jax.Array,
    axis: int = 0,
    reduction: str = "none",
) -> jax.Array:
    """torch.scatter / ONNX ScatterElements (out-of-place)."""
    data = jnp.asarray(data)
    axis = axis % data.ndim
    indices = _normalize_indices(jnp.asarray(indices), data.shape[axis])
    if reduction not in _REDUCTIONS:
        raise ValueError(f"unknown reduction {reduction!r}")
    # build full coordinate grid for take_along_axis-style scatter
    coords = list(jnp.meshgrid(
        *[jnp.arange(s) for s in indices.shape], indexing="ij"
    ))
    coords[axis] = indices
    return _REDUCTIONS[reduction](data, tuple(coords), updates)


@register_op("scatter_nd")
def scatter_nd(
    data: jax.Array,
    indices: jax.Array,
    updates: jax.Array,
    reduction: str = "none",
) -> jax.Array:
    """ONNX ScatterND (out-of-place update of data)."""
    data = jnp.asarray(data)
    indices = jnp.asarray(indices)
    if reduction not in _REDUCTIONS:
        raise ValueError(f"unknown reduction {reduction!r}")
    idx = tuple(jnp.moveaxis(indices, -1, 0))
    return _REDUCTIONS[reduction](data, idx, updates)


# ---------------------------------------------------------------------------
# shape inference (host-side, mirrors the Mojo *_shape functions)
# ---------------------------------------------------------------------------


def gather_shape(data_shape: tuple, indices_shape: tuple, axis: int = 0) -> tuple:
    axis = axis % len(data_shape)
    return data_shape[:axis] + tuple(indices_shape) + data_shape[axis + 1 :]


def gather_nd_shape(
    data_shape: tuple, indices_shape: tuple, batch_dims: int = 0
) -> tuple:
    r = indices_shape[-1]
    return (
        tuple(indices_shape[:-1])
        + tuple(data_shape[batch_dims + r :])
    )


def scatter_nd_shape(data_shape: tuple, indices_shape: tuple, updates_shape: tuple) -> tuple:
    expected = tuple(indices_shape[:-1]) + tuple(data_shape[indices_shape[-1]:])
    if tuple(updates_shape) != expected:
        raise ValueError(
            f"updates shape {updates_shape} incompatible; expected {expected}"
        )
    return tuple(data_shape)

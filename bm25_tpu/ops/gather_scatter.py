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


# named reductions for gather_reduce: (combine_fn, identity); matches the
# arbitrary reduce_fn/reduce_init parameters of the reference kernel
# (/root/reference/operations/gather_scatter.mojo:116-140) with the identity
# supplied per reduction instead of per call
def _lowest(dtype):
    return -jnp.inf if jnp.issubdtype(dtype, jnp.floating) else jnp.iinfo(dtype).min


def _highest(dtype):
    return jnp.inf if jnp.issubdtype(dtype, jnp.floating) else jnp.iinfo(dtype).max


_GATHER_REDUCE_FNS = {
    "sum": (jnp.sum, lambda dt: 0),
    "max": (jnp.max, _lowest),
    "min": (jnp.min, _highest),
    "prod": (jnp.prod, lambda dt: 1),
}


@register_op("gather_reduce")
def gather_reduce(
    data: jax.Array,
    indices: jax.Array,
    reduce_fn="sum",
    reduce_init=None,
) -> jax.Array:
    """Fused gather + reduce: for each index row, reduce the gathered rows.

    ``data (N, *F)``, ``indices (*B, M)`` -> ``(*B, *F)``: EmbeddingBag-style
    multi-hot reduction (reference ``gather_reduce``,
    ``gather_scatter.mojo:116-281``, whose ``reduce_fn``/``reduce_init``
    parameters this mirrors).  ``reduce_fn`` is one of "sum"/"max"/"min"/
    "prod"/"mean", or any callable ``f(array, axis=...)`` paired with an
    explicit ``reduce_init`` identity.  Negative indices are padding and
    contribute the identity (our unified pad contract).  sum is exactly the
    BM25 scoring primitive: data = token-major score matrix, indices =
    query ids.
    """
    indices = jnp.asarray(indices)
    valid = indices >= 0
    safe = jnp.where(valid, indices, 0)
    g = jnp.take(data, safe, axis=0)  # (*B, M, *F)
    mask = valid.reshape(valid.shape + (1,) * (data.ndim - 1))
    axis = indices.ndim - 1
    if reduce_fn == "mean":
        # mean over the *valid* gathered rows (pads excluded)
        total = jnp.sum(jnp.where(mask, g, 0).astype(g.dtype), axis=axis)
        count = jnp.maximum(jnp.sum(mask, axis=axis), 1).astype(g.dtype)
        return total / count
    if callable(reduce_fn):
        if reduce_init is None:
            raise ValueError("a callable reduce_fn needs an explicit reduce_init")
        fn, init = reduce_fn, reduce_init
    else:
        try:
            fn, init_fn = _GATHER_REDUCE_FNS[reduce_fn]
        except KeyError:
            raise ValueError(
                f"unknown reduce_fn {reduce_fn!r}; expected one of "
                f"{sorted(_GATHER_REDUCE_FNS)} + ['mean'] or a callable"
            ) from None
        init = init_fn(g.dtype) if reduce_init is None else reduce_init
    return fn(jnp.where(mask, g, jnp.asarray(init, g.dtype)), axis=axis)


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
    update_fn=None,
) -> jax.Array:
    """ONNX ScatterND (out-of-place update of data).

    ``update_fn`` optionally replaces the named reduction with an arbitrary
    ``f(old, update) -> new`` — the reference's ``scatter_nd_generator``
    update lambda (``/root/reference/operations/gather_scatter.mojo:
    772-1011``), realized as gather -> apply -> set.  Duplicate indices
    follow the ONNX contract (unspecified order; here the last write wins),
    same as the reference's parallelized generator.
    """
    data = jnp.asarray(data)
    indices = jnp.asarray(indices)
    idx = tuple(jnp.moveaxis(indices, -1, 0))
    if update_fn is not None:
        old = data[idx]
        return data.at[idx].set(update_fn(old, updates), mode="drop")
    if reduction not in _REDUCTIONS:
        raise ValueError(f"unknown reduction {reduction!r}")
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

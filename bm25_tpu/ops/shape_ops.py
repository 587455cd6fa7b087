"""Reshape / arange utilities with explicit shape inference.

Mirrors the reference's utility kernels
(``/root/reference/operations/reshape.mojo``, ``arange.mojo``): zero-copy
contiguous reshape with -1 dimension inference and a validated arange.  On
TPU the "zero-copy view" property is XLA's: an in-program reshape of a
contiguous buffer is a metadata change.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from bm25_tpu.ops.registry import register_op


def reshape_shape(input_shape: tuple, target: tuple) -> tuple:
    """Resolve a reshape target with at most one -1 dim (reshape.mojo:68-113)."""
    target = tuple(int(t) for t in target)
    if sum(1 for t in target if t == -1) > 1:
        raise ValueError(f"at most one -1 allowed in reshape target {target}")
    total = math.prod(input_shape)
    if -1 in target:
        known = math.prod(t for t in target if t != -1)
        if known == 0 or total % known:
            raise ValueError(f"cannot infer -1 in {target} from {input_shape}")
        target = tuple(total // known if t == -1 else t for t in target)
    if math.prod(target) != total:
        raise ValueError(f"reshape {input_shape} -> {target} changes element count")
    return target


@register_op("reshape")
def reshape(x: jax.Array, shape: tuple) -> jax.Array:
    """Contiguous reshape with -1 inference (reshape.mojo:24-46)."""
    return jnp.reshape(x, reshape_shape(jnp.shape(x), shape))


def arange_shape(start, stop, step) -> tuple[int]:
    """Validated output length (arange.mojo:47-59 semantics)."""
    if step == 0:
        raise ValueError("arange step must be nonzero")
    n = math.ceil((stop - start) / step)
    if n < 0:
        raise ValueError(f"arange({start}, {stop}, {step}) is empty/negative")
    return (int(n),)


@register_op("arange")
def arange(start, stop=None, step=1, dtype=jnp.int32) -> jax.Array:
    """Device iota-based arange (arange.mojo:26-44)."""
    if stop is None:
        start, stop = 0, start
    (n,) = arange_shape(start, stop, step)
    base = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    return (jnp.asarray(start, dtype) + base.astype(dtype) * jnp.asarray(step, dtype))

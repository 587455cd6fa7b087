"""Exact weighted token-count matrices for the MXU scoring paths.

The obvious ``(one_hot(ids) * w[:, :, None]).sum(axis=1)`` is rewritten by
XLA into an f32 matmul over the T axis, which this TPU executes as bf16
passes (precision=HIGHEST is ignored by the PJRT plugin — see NOTES.md
hardware bug 1), silently corrupting the counts by ~4e-3 rel *before* the
split-precision scheme can help.  A scatter-add stays on the exact path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_counts(ids: jax.Array, w: jax.Array, width: int) -> jax.Array:
    """Exact f32 (Q, width) weighted counts: cf[q, v] = sum of w[q, t] over
    t with ids[q, t] == v.  Negative ids (pad/OOV/cold) contribute nothing.
    """
    q = ids.shape[0]
    valid = ids >= 0
    safe = jnp.where(valid, ids, width)  # extra column catches pads
    wm = jnp.where(valid, w.astype(jnp.float32), 0.0)
    rows = jnp.broadcast_to(jnp.arange(q)[:, None], ids.shape)
    cf = jnp.zeros((q, width + 1), jnp.float32).at[rows, safe].add(wm)
    return cf[:, :width]


def split_bf16(cf: jax.Array) -> tuple[jax.Array, jax.Array]:
    """bf16 (high, residual) pair whose exact sum is ~cf; two/three bf16
    single-pass MXU products over such pairs reconstruct ~f32 accuracy.

    The high part is hidden behind an optimization barrier before the
    subtract: XLA otherwise simplifies the ``bf16 -> f32`` round-trip away
    and computes ``cf - cf = 0`` for the residual (measured on v5e — the
    compiled graph's third product returned ~0 and the split silently
    degraded to plain bf16).  Computing the split inside a jit is only
    safe through this function.
    """
    hi = cf.astype(jnp.bfloat16)
    hi = jax.lax.optimization_barrier(hi)
    lo = (cf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def sum_split_products(*parts: jax.Array) -> jax.Array:
    """Sum split-precision MXU products without losing the residuals.

    XLA's algebraic simplifier merges ``dot(a, hi) + dot(a, lo)`` (shared
    operand) into ``dot(a, hi + lo)`` with the add performed in bf16 —
    which rounds ``hi + lo`` back to ``hi`` and silently discards the
    entire residual product (measured 1.7e-3 rel err on v5e; each dot in
    isolation is exact).  An optimization barrier around the products
    forces the f32 adds to happen on the dots' outputs.
    """
    parts = jax.lax.optimization_barrier(tuple(parts))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out

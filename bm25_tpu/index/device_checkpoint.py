"""Sharded device checkpoints via Orbax (multi-chip warm restart).

Complements index/snapshot.py (host-side .npz): for sharded engines the
index arrays live distributed across the mesh, and Orbax checkpoints them
without gathering to one host — each process writes its shards, and
restore places shards directly according to the target sharding.  This is
the restart path for multi-host serving (the reference has no multi-device
state at all, SURVEY.md section 5).
"""

from __future__ import annotations

import os

import jax


def _engine_state(engine) -> dict:
    name = type(engine).__name__
    if name == "ShardedEngine":
        return {"st": engine.st, "offsets": engine.offsets}
    if name == "ShardedSparseEngine":
        return {
            "tokT": engine.tokT,
            "valT": engine.valT,
            "doc_ids": engine.doc_ids,
            "offsets": engine.offsets,
        }
    if name == "DenseEngine":
        return {"st": engine.st, "offsets": engine.offsets}
    if name == "SparseEngine":
        # buckets is a list of dicts of device arrays — a pytree Orbax
        # shards/restores directly, skipping the host index rebuild on a
        # warm restart (3.7 GB device state at MS MARCO scale)
        return {
            "buckets": engine.buckets,
            "offsets": engine.offsets,
            "hot_table": engine.hot_table,
        }
    raise TypeError(
        f"unsupported engine type {name}; use index/snapshot.py for "
        "host-side index state"
    )


def save_device_checkpoint(path: str | os.PathLike, engine) -> None:
    """Write the engine's device arrays as an Orbax checkpoint."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.fspath(path))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _engine_state(engine))


def restore_device_checkpoint(path: str | os.PathLike, engine) -> None:
    """Restore device arrays in place of the engine's (same mesh/sharding).

    ``engine`` must be constructed with the same index metadata (shapes,
    mesh); its arrays provide the target shardings for distributed restore.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.fspath(path))
    state = _engine_state(engine)
    targets = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state,
    )
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, targets)
    for key, val in restored.items():
        setattr(engine, key, val)

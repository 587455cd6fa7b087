"""Device checkpoints via Orbax: warm restart without the host rebuild.

Complements index/snapshot.py (host-side .npz): engines checkpoint every
device array their query step reads, plus a JSON metadata sidecar carrying
the scalar fields (num_docs, hot_h, ...) and the vocab.  Restore therefore
has a metadata-only path — ``load_device_checkpoint`` reconstructs the
engine object from the sidecar and places arrays straight onto the device
mesh, skipping ``from_scored_index`` (and the ELL/hot-split rebuild)
entirely.  For sharded engines each process writes/reads only its shards.

The reference has no multi-device or device-resident state at all
(SURVEY.md section 5); this is the TPU-native extension of its bm25s
save/load checkpointing (``/root/reference/bm25_test.py:35-42``).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

# v4: bucket hot tiers are stored SPARSE (hotNz{Rank,Pos,Hi,Lo} — 12 B
# per posting instead of 4 B per dense cell, ~13x smaller checkpoints)
# and the dense bf16 pair is rebuilt on device at restore via two exact
# membership scans.  v3 (dense) and v2 checkpoints still load.
CHECKPOINT_VERSION = 4

# per-field PartitionSpec factories for sharded restore targets; bucket
# dict leaves resolve by key name (see _mesh_shardings)
_SHARDED_FIELD_SPECS = {
    "st": ("none", "docs"),
    "tokT": ("none", "docs"),
    "valT": ("none", "docs"),
    "hotT": ("none", "docs"),
    "hotLo": ("none", "docs"),
    "doc_ids": ("docs",),
    "offsets": (),
    "hot_table": (),
    # sparse hot leaves restore replicated (host-side rebuild re-shards)
    "hotNzRank": (),
    "hotNzPos": (),
    "hotNzHi": (),
    "hotNzLo": (),
}
_SHARDED_ENGINES = ("ShardedEngine", "ShardedSparseEngine")


def _compact_buckets(buckets: list) -> list:
    """Bucket state with dense hot pairs replaced by their sparse form.

    Sparsifying needs the full pair on THIS host; on a multi-process mesh
    the hot arrays are not fully addressable here, so those buckets keep
    their dense leaves (v3 form — Orbax writes sharded leaves natively,
    each process its own shards).  Restore handles either form per
    bucket.
    """
    from bm25_tpu.models.sparse import hot_pair_to_sparse

    out = []
    for b in buckets:
        if "hotT" in b and getattr(
            b["hotT"], "is_fully_addressable", True
        ):
            entry = {k: v for k, v in b.items()
                     if k not in ("hotT", "hotLo")}
            entry.update(hot_pair_to_sparse(b["hotT"], b["hotLo"]))
        else:
            entry = dict(b)
        out.append(entry)
    return out


def _engine_state(engine, compact: bool = True) -> dict:
    """Every device array the engine's query step reads.

    ``compact=True`` (the save path) stores bucket hot tiers sparse;
    ``compact=False`` keeps the live dense arrays (used to derive restore
    targets for legacy checkpoints without a metadata sidecar).
    """
    maybe = _compact_buckets if compact else (lambda b: b)
    name = type(engine).__name__
    if name == "ShardedEngine":
        return {"st": engine.st, "offsets": engine.offsets}
    if name == "ShardedSparseEngine":
        return {
            "buckets": maybe(engine.buckets),
            "offsets": engine.offsets,
            "hot_table": engine.hot_table,
        }
    if name == "DenseEngine":
        return {"st": engine.st, "offsets": engine.offsets}
    if name == "SparseEngine":
        state = {
            "buckets": maybe(engine.buckets),
            "offsets": engine.offsets,
            "hot_table": engine.hot_table,
        }
        for key in ("tail_docs", "tail_vals", "tail_toks", "tail_rows",
                    "tail_gpos"):
            arr = getattr(engine, key, None)
            if arr is not None:
                state[key] = arr
        return state
    raise TypeError(
        f"unsupported engine type {name}; use index/snapshot.py for "
        "host-side index state"
    )


def _engine_meta(engine, state: dict | None = None) -> dict:
    """Metadata sidecar; pass the already-computed ``state`` from the save
    path — recomputing it here would run the bucket compaction (a full
    device->host pull of the dense hot pair) a second time."""
    name = type(engine).__name__
    if state is None:
        state = _engine_state(engine)
    meta = {
        "version": CHECKPOINT_VERSION,
        "engine": name,
        "num_docs": int(engine.num_docs),
        "vocab_size": int(engine.vocab_size),
        "vocab": engine.vocab,
        "hot_h": int(getattr(engine, "hot_h", 0)),
        "tail_cap": int(getattr(engine, "tail_cap", 0)),
        "score_dtype": getattr(engine, "score_dtype", "float32"),
        "tree": jax.tree.map(
            lambda x: [list(x.shape), str(x.dtype)], state
        ),
    }
    mesh = getattr(engine, "mesh", None)
    if mesh is not None:
        # sharded bucket rows are aligned to BLOCK_ROWS * doc-axis size at
        # build time; restoring onto a mesh with a different doc axis would
        # fail deep inside the Pallas kernel — record the topology so load
        # can fail with a message instead
        meta["mesh_shape"] = {str(k): int(v) for k, v in mesh.shape.items()}
    return meta


def _meta_path(path: str) -> str:
    return path + ".meta.json"


def save_device_checkpoint(path: str | os.PathLike, engine) -> None:
    """Write the engine's device arrays + metadata sidecar."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.fspath(path))
    state = _engine_state(engine)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)
    if jax.process_index() == 0:
        with open(_meta_path(path), "w") as f:
            json.dump(_engine_meta(engine, state), f)


def _restore_state(path: str, meta: dict, shardings) -> dict:
    import orbax.checkpoint as ocp

    targets = jax.tree.map(
        lambda spec, sh: jax.ShapeDtypeStruct(
            tuple(spec[0]), np.dtype(spec[1]), sharding=sh
        ),
        meta["tree"],
        shardings,
        is_leaf=lambda x: isinstance(x, list) and len(x) == 2
        and isinstance(x[1], str),
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, targets)


def _single_device_shardings(meta: dict, device) -> dict:
    sh = jax.sharding.SingleDeviceSharding(device)
    return jax.tree.map(
        lambda spec: sh,
        meta["tree"],
        is_leaf=lambda x: isinstance(x, list) and len(x) == 2
        and isinstance(x[1], str),
    )


def _mesh_shardings(meta: dict, mesh) -> dict:
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bm25_tpu.parallel.mesh import DOC_AXIS

    def to_sharding(field_spec):
        parts = tuple(
            None if p == "none" else DOC_AXIS if p == "docs" else p
            for p in field_spec
        )
        return NamedSharding(mesh, P(*parts))

    def is_leaf(x):
        # meta leaves are [shape_list, dtype_str] pairs
        return (isinstance(x, list) and len(x) == 2 and isinstance(x[1], str)
                and isinstance(x[0], list))

    def map_node(node, key=None):
        if is_leaf(node):
            return to_sharding(_SHARDED_FIELD_SPECS[key])
        if isinstance(node, dict):
            # dict leaves resolve by key name (handles the bucket-list tree)
            return {k: map_node(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(map_node(v, key) for v in node)
        raise TypeError(f"unexpected checkpoint tree node {type(node)}")

    return map_node(meta["tree"])


def _rebuild_buckets(buckets: list, hot_h: int, put=None, mesh=None) -> list:
    """Rebuild dense (H, rows) hot pairs from v4 sparse bucket leaves.

    Single-chip: ``put`` places host arrays on the session device and the
    membership-scan runs plainly.  Sharded: the rebuilt ELL row axis is
    device_put doc-sharded and the scan runs under shard_map (the scan is
    row-parallel, no collectives).
    """
    out = []
    for b in buckets:
        if "hotNzRank" not in b:
            out.append(b)
            continue
        sparse = {
            k: np.asarray(b[k])
            for k in ("hotNzRank", "hotNzPos", "hotNzHi", "hotNzLo")
        }
        rows = b["doc_ids"].shape[0]
        if mesh is None:
            from bm25_tpu.models.sparse import rebuild_hot_pair_from_sparse

            hi, lo = rebuild_hot_pair_from_sparse(hot_h, rows, sparse, put)
        else:
            hi, lo = _rebuild_hot_sharded(hot_h, rows, sparse, mesh)
        nb = {k: v for k, v in b.items() if not k.startswith("hotNz")}
        nb["hotT"], nb["hotLo"] = hi, lo
        out.append(nb)
    return out


def _rebuild_hot_sharded(hot_h: int, rows: int, sparse: dict, mesh):
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bm25_tpu.models.sparse import _sparse_hot_ell
    from bm25_tpu.ops.ell_score import ell_score_pallas
    from bm25_tpu.parallel.mesh import DOC_AXIS

    interpret = jax.devices()[0].platform != "tpu"
    row_sh = NamedSharding(mesh, P(None, DOC_AXIS))
    rep = NamedSharding(mesh, P())
    ids = jax.device_put(
        np.arange(hot_h, dtype=np.int32).reshape(-1, 1), rep
    )

    def scan_cast(i, t, v):
        return ell_score_pallas(i, t, v, interpret=interpret).astype(
            jnp.bfloat16
        )

    scan = jax.jit(jax.shard_map(
        scan_cast, mesh=mesh,
        in_specs=(P(), P(None, DOC_AXIS), P(None, DOC_AXIS)),
        out_specs=P(None, DOC_AXIS), check_vma=False,
    ))
    out = []
    for key in ("hotNzHi", "hotNzLo"):
        tokT, valT = _sparse_hot_ell(
            rows, sparse["hotNzRank"], sparse["hotNzPos"], sparse[key]
        )
        out.append(scan(ids, jax.device_put(tokT, row_sh),
                        jax.device_put(valT, row_sh)))
    out[0].block_until_ready()
    return out[0], out[1]


def load_device_checkpoint(
    path: str | os.PathLike, mesh=None, session=None
):
    """Reconstruct an engine from a checkpoint — metadata-only, no host index.

    This is the warm-restart path: no ScoredIndex, no ELL re-bucketing, no
    hot/cold re-split; arrays restore straight to their device placements.
    ``mesh`` is required for sharded engine types (must match the shape the
    checkpoint was saved under); ``session`` optionally pins the device for
    single-chip engines.
    """
    path = os.path.abspath(os.fspath(path))
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    if meta["version"] > CHECKPOINT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta['version']}")
    name = meta["engine"]
    vocab = meta["vocab"]
    if vocab is not None:
        vocab = dict(vocab)

    if name in ("DenseEngine", "SparseEngine"):
        from bm25_tpu.runtime.session import get_session

        session = session or get_session()
        state = _restore_state(
            path, meta, _single_device_shardings(meta, session.device)
        )
        if name == "DenseEngine":
            from bm25_tpu.models.dense import DenseEngine

            return DenseEngine(
                st=state["st"],
                offsets=state["offsets"],
                num_docs=meta["num_docs"],
                vocab_size=meta["vocab_size"],
                session=session,
                vocab=vocab,
            )
        from bm25_tpu.models.sparse import SparseEngine, fit_score_buffer_budget

        engine = SparseEngine(
            buckets=_rebuild_buckets(
                state["buckets"], meta["hot_h"], put=session.put
            ),
            offsets=state["offsets"],
            hot_table=state["hot_table"],
            # host copy re-derived from the checkpointed table so the
            # cold-width query routing works after a warm restart too
            hot_table_host=np.asarray(state["hot_table"]),
            hot_h=meta["hot_h"],
            num_docs=meta["num_docs"],
            vocab_size=meta["vocab_size"],
            session=session,
            vocab=vocab,
            tail_docs=state.get("tail_docs"),
            tail_vals=state.get("tail_vals"),
            tail_toks=state.get("tail_toks"),
            tail_rows=state.get("tail_rows"),
            tail_gpos=state.get("tail_gpos"),
            tail_cap=meta.get("tail_cap", 0),
            score_dtype=meta.get("score_dtype", "float32"),
        )
        # re-apply the HBM-headroom budget shrink (the warm-restart path
        # must not reintroduce the worker-killing transient-buffer OOM)
        fit_score_buffer_budget(engine)
        return engine

    if name in _SHARDED_ENGINES:
        if mesh is None:
            from bm25_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
        saved_mesh = meta.get("mesh_shape")
        if saved_mesh is not None:
            from bm25_tpu.parallel.mesh import DOC_AXIS as _DOC

            live_docs_axis = int(mesh.shape[_DOC])
            if int(saved_mesh.get(_DOC, live_docs_axis)) != live_docs_axis:
                raise ValueError(
                    f"{path}: checkpoint was saved on a mesh with "
                    f"{saved_mesh.get(_DOC)} doc shards but the restore "
                    f"mesh has {live_docs_axis} — bucket row alignment is "
                    "fixed at build time; restore on a matching mesh or "
                    "rebuild the engine from the host index"
                )
        state = _restore_state(path, meta, _mesh_shardings(meta, mesh))
        if name == "ShardedEngine":
            from bm25_tpu.parallel.sharded_engine import ShardedEngine

            return ShardedEngine(
                st=state["st"],
                offsets=state["offsets"],
                num_docs=meta["num_docs"],
                vocab_size=meta["vocab_size"],
                mesh=mesh,
                vocab=vocab,
                _cache={},
            )
        from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

        if "buckets" in state:
            buckets = _rebuild_buckets(
                state["buckets"], meta["hot_h"], mesh=mesh
            )
        else:
            # version-2 checkpoints saved one flat bucket's fields
            buckets = [{
                key: state[key]
                for key in ("tokT", "valT", "doc_ids")
            }]
            if meta["hot_h"] > 0:
                buckets[0]["hotT"] = state["hotT"]
                buckets[0]["hotLo"] = state["hotLo"]
        return ShardedSparseEngine(
            buckets=buckets,
            hot_table=state["hot_table"],
            # host copy re-derived so cold-width query routing works after
            # a warm restart (mirrors the single-chip SparseEngine path)
            hot_table_host=np.asarray(state["hot_table"]),
            hot_h=meta["hot_h"],
            offsets=state["offsets"],
            num_docs=meta["num_docs"],
            vocab_size=meta["vocab_size"],
            mesh=mesh,
            vocab=vocab,
            _cache={},
            score_dtype=meta.get("score_dtype", "float32"),
        )
    raise TypeError(f"unsupported engine type {name} in checkpoint")


def restore_device_checkpoint(path: str | os.PathLike, engine) -> None:
    """Restore device arrays in place of an already-built engine's.

    Prefer ``load_device_checkpoint`` (no host rebuild needed); this
    variant exists for restoring into a live engine whose mesh/session
    should be kept.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.fspath(path))
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path)) as f:
            meta = json.load(f)
        # refuse mismatched restores up front: a wrong-engine or
        # wrong-corpus checkpoint whose array shapes happen to line up
        # would otherwise setattr cleanly and serve wrong results with no
        # error (e.g. a 1000-doc checkpoint into a 1010-doc engine whose
        # padded shapes agree leaves 10 doc ids ranking on zero columns)
        live_name = type(engine).__name__
        if meta.get("engine") not in (None, live_name):
            raise ValueError(
                f"{path}: checkpoint holds {meta['engine']} state; the "
                f"live engine is a {live_name}"
            )
        for field in ("num_docs", "vocab_size", "hot_h"):
            saved = meta.get(field)
            live = getattr(engine, field, None)
            if (saved is not None and live is not None
                    and int(saved) != int(live)):
                raise ValueError(
                    f"{path}: checkpoint {field}={saved} != live engine "
                    f"{field}={live}; restore into a matching engine or "
                    "use load_device_checkpoint (which rebuilds the "
                    "engine object from the checkpoint metadata)"
                )
        # shardings derive from the META tree (v4 trees carry sparse hot
        # leaves the live engine doesn't have), placed on the live
        # engine's device or mesh
        mesh = getattr(engine, "mesh", None)
        if mesh is not None:
            shardings = _mesh_shardings(meta, mesh)
        else:
            shardings = _single_device_shardings(meta, engine.session.device)
        restored = _restore_state(path, meta, shardings)
        if "buckets" in restored:
            restored["buckets"] = _rebuild_buckets(
                restored["buckets"], meta.get("hot_h", 0),
                put=None if mesh is not None else engine.session.put,
                mesh=mesh,
            )
    else:
        state = _engine_state(engine, compact=False)
        # pre-sidecar checkpoints (saved before the metadata file existed):
        # derive the restore targets from the live engine's arrays, the
        # original behavior — shapes must match what was checkpointed
        targets = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding),
            state,
        )
        try:
            with ocp.StandardCheckpointer() as ckptr:
                restored = ckptr.restore(path, targets)
        except Exception as e:
            # the most likely cause is a v4 checkpoint (sparse hotNz*
            # leaves) whose sidecar was lost — the legacy target tree can
            # never match it, and Orbax's structure error doesn't say why
            raise ValueError(
                f"{path}: restore without the metadata sidecar failed — "
                "pre-sidecar checkpoints must match the live engine's "
                f"array tree exactly; if this checkpoint was saved with "
                f"one, put '{_meta_path(path)}' back alongside it"
            ) from e
    for key, val in restored.items():
        setattr(engine, key, val)
    # keep the host routing copy coherent with the restored device table:
    # a checkpoint with the same shapes but a different hot-token assignment
    # would otherwise strip tokens the device table no longer marks hot
    if "hot_table" in restored and hasattr(engine, "hot_table_host"):
        engine.hot_table_host = np.asarray(restored["hot_table"])

"""Engine auto-selection: dense (MXU/VPU gather) vs sparse (padded postings).

Dense is fastest when the (V x D) score matrix fits the HBM budget; beyond
that the ELL/padded-postings sparse engine keeps memory at ~CSC footprint.
"""

from __future__ import annotations

import inspect

from bm25_tpu.scoring import ScoredIndex

def _default_dense_budget() -> int:
    """Half the device's HBM: headroom for query buffers + compiler
    scratch (8 GiB on a 16 GiB v5e — scales with the chip)."""
    from bm25_tpu.models.sparse import device_hbm_bytes

    return device_hbm_bytes() // 2


def _build(cls, index, kwargs, filter_kwargs: bool):
    if not filter_kwargs:
        # explicit modes keep strict kwargs: a typo or an option the
        # chosen engine doesn't support must raise, not silently no-op
        return cls.from_scored_index(index, **kwargs)
    # mode="auto": keep only the kwargs the chosen engine understands, so
    # engine-specific options (e.g. sparse-only score_dtype) compose
    params = inspect.signature(cls.from_scored_index).parameters
    return cls.from_scored_index(
        index, **{k: v for k, v in kwargs.items() if k in params}
    )


def create_engine(
    index: ScoredIndex,
    mode: str = "auto",
    dense_budget_bytes: int | None = None,
    **kwargs,
):
    """Build the best device engine for this index.

    mode: "auto" / "dense" / "sparse" / "sharded" / "sharded_sparse".
    Extra kwargs pass through to the chosen engine's ``from_scored_index``.
    Under mode="auto" kwargs the selected engine doesn't understand are
    dropped (engine-specific options must compose with either choice);
    explicit modes keep strict kwargs and raise on unknown options.
    """
    if mode == "sharded":
        from bm25_tpu.parallel.sharded_engine import ShardedEngine

        return _build(ShardedEngine, index, kwargs, filter_kwargs=False)
    if mode == "sharded_sparse":
        from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

        return _build(ShardedSparseEngine, index, kwargs, filter_kwargs=False)
    if mode == "dense":
        from bm25_tpu.models.dense import DenseEngine

        return _build(DenseEngine, index, kwargs, filter_kwargs=False)
    if mode == "sparse":
        from bm25_tpu.models.sparse import SparseEngine

        return _build(SparseEngine, index, kwargs, filter_kwargs=False)
    if mode != "auto":
        raise ValueError(f"unknown engine mode {mode!r}")

    if dense_budget_bytes is None:
        dense_budget_bytes = _default_dense_budget()
    # a user-supplied max_bytes is a HARD cap on the dense engine: the
    # decision must respect it, or auto picks dense and then crashes on
    # DenseEngine's own MemoryError instead of falling back to sparse
    if "max_bytes" in kwargs:
        dense_budget_bytes = min(dense_budget_bytes, kwargs["max_bytes"])
    # mirror DenseEngine.from_scored_index's REAL padded allocation
    # (v+1 rows rounded to 8; docs rounded to the gather kernel's true
    # quantum) at the dtype it will actually allocate — an optimistic
    # estimate here would pick dense and then crash on its MemoryError
    import numpy as np

    from bm25_tpu.ops.gather_rows import doc_pad
    from bm25_tpu.utils.padding import next_multiple

    v = next_multiple(index.vocab_size + 1, 8)
    d = doc_pad(index.num_docs)
    itemsize = np.dtype(kwargs.get("dtype", np.float32)).itemsize
    if v * d * itemsize <= dense_budget_bytes:
        from bm25_tpu.models.dense import DenseEngine

        # forward the budget: the engine's own default cap (12 GiB) must
        # not veto what the auto policy just sized against this device
        kw = dict(kwargs)
        kw.setdefault("max_bytes", dense_budget_bytes)
        return _build(DenseEngine, index, kw, filter_kwargs=True)
    from bm25_tpu.models.sparse import SparseEngine

    return _build(SparseEngine, index, kwargs, filter_kwargs=True)

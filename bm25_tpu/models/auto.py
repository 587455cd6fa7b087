"""Engine auto-selection: dense (MXU/VPU gather) vs sparse (padded postings).

Dense is fastest when the (V x D) score matrix fits the HBM budget; beyond
that the ELL/padded-postings sparse engine keeps memory at ~CSC footprint.
"""

from __future__ import annotations

import inspect

from bm25_tpu.scoring import ScoredIndex

# leave headroom on a 16 GiB v5e chip for query buffers + compiler scratch
DEFAULT_DENSE_BUDGET = 8 << 30


def _build(cls, index, kwargs):
    # keep only the kwargs the chosen engine understands, so options like
    # score_dtype (sparse-only) compose with mode="auto"
    params = inspect.signature(cls.from_scored_index).parameters
    return cls.from_scored_index(
        index, **{k: v for k, v in kwargs.items() if k in params}
    )


def create_engine(
    index: ScoredIndex,
    mode: str = "auto",
    dense_budget_bytes: int = DEFAULT_DENSE_BUDGET,
    **kwargs,
):
    """Build the best device engine for this index.

    mode: "auto" / "dense" / "sparse" / "sharded" / "sharded_sparse".
    Extra kwargs pass through to the chosen engine's ``from_scored_index``
    (unknown ones are dropped, so sparse-only options compose with "auto").
    """
    if mode == "sharded":
        from bm25_tpu.parallel.sharded_engine import ShardedEngine

        return _build(ShardedEngine, index, kwargs)
    if mode == "sharded_sparse":
        from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

        return _build(ShardedSparseEngine, index, kwargs)
    if mode == "dense":
        from bm25_tpu.models.dense import DenseEngine

        return _build(DenseEngine, index, kwargs)
    if mode == "sparse":
        from bm25_tpu.models.sparse import SparseEngine

        return _build(SparseEngine, index, kwargs)
    if mode != "auto":
        raise ValueError(f"unknown engine mode {mode!r}")

    v = index.vocab_size + 8
    d = index.num_docs + 128
    if v * d * 4 <= dense_budget_bytes:
        from bm25_tpu.models.dense import DenseEngine

        return _build(DenseEngine, index, kwargs)
    from bm25_tpu.models.sparse import SparseEngine

    return _build(SparseEngine, index, kwargs)

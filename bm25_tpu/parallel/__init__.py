"""Multi-chip serving: mesh construction, doc-sharded engines, multi-host."""

from bm25_tpu.parallel.mesh import DATA_AXIS, DOC_AXIS, make_mesh
from bm25_tpu.parallel.sharded_engine import ShardedEngine, ShardedSparseEngine

__all__ = [
    "DATA_AXIS", "DOC_AXIS", "make_mesh",
    "ShardedEngine", "ShardedSparseEngine",
]

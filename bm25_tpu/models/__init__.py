"""Device engines: dense, sparse (ELL), and auto-selection."""

from bm25_tpu.models.auto import create_engine
from bm25_tpu.models.dense import DenseEngine
from bm25_tpu.models.sparse import SparseEngine

__all__ = ["create_engine", "DenseEngine", "SparseEngine"]

"""bm25-tpu: a TPU-native BM25 index-and-query engine (JAX/XLA/Pallas).

From-scratch re-design of the capability surface of yuhuishi-convect/mojo-bm25
(see SURVEY.md): BM25 index build, bm25s-compatible on-disk format, batched
top-k query on accelerator, a kernel library (top-k, gather/scatter, matmul),
and multi-chip doc-sharded serving over a JAX device mesh.

Import layering: ``import bm25_tpu`` stays host-only (numpy/scipy); JAX is
pulled in lazily on first access to device engines / ops / parallel.
"""

from bm25_tpu.scoring import (
    BM25Params, ScoredIndex, build_scored_index, explain_score)
from bm25_tpu.reference import ReferenceEngine, topk_descending
from bm25_tpu.text.tokenizer import Tokenizer, TokenizedCorpus, pad_token_lists
from bm25_tpu.index.builder import build_index
from bm25_tpu.index.io import load_index, save_index, MMapCorpus

__version__ = "0.1.0"

_LAZY = {
    "DenseEngine": ("bm25_tpu.models.dense", "DenseEngine"),
    "SparseEngine": ("bm25_tpu.models.sparse", "SparseEngine"),
    "ShardedEngine": ("bm25_tpu.parallel.sharded_engine", "ShardedEngine"),
    "ShardedSparseEngine": ("bm25_tpu.parallel.sharded_engine", "ShardedSparseEngine"),
    "Session": ("bm25_tpu.runtime.session", "Session"),
    "get_session": ("bm25_tpu.runtime.session", "get_session"),
    "create_engine": ("bm25_tpu.models.auto", "create_engine"),
    "Retriever": ("bm25_tpu.retriever", "Retriever"),
    "BM25": ("bm25_tpu.compat", "BM25"),
    "BM25v": ("bm25_tpu.compat", "BM25v"),
    "Server": ("bm25_tpu.serve", "Server"),
    "StreamingIndexBuilder": ("bm25_tpu.index.streaming", "StreamingIndexBuilder"),
    "save_snapshot": ("bm25_tpu.index.snapshot", "save_snapshot"),
    "load_snapshot": ("bm25_tpu.index.snapshot", "load_snapshot"),
    "UpdatableRetriever": ("bm25_tpu.index.updates", "UpdatableRetriever"),
    "save_device_checkpoint": (
        "bm25_tpu.index.device_checkpoint", "save_device_checkpoint"),
    "load_device_checkpoint": (
        "bm25_tpu.index.device_checkpoint", "load_device_checkpoint"),
}


def __getattr__(name):
    try:
        module, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(module), attr)


__all__ = [
    "BM25Params", "ScoredIndex", "build_scored_index", "explain_score",
    "ReferenceEngine", "topk_descending",
    "Tokenizer", "TokenizedCorpus", "pad_token_lists",
    "build_index", "load_index", "save_index", "MMapCorpus",
    *_LAZY,
]

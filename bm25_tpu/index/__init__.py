"""Index build, persistence (bm25s format), snapshots, streaming, merging."""

from bm25_tpu.index.builder import BuildStats, build_index
from bm25_tpu.index.io import MMapCorpus, load_index, save_corpus, save_index
from bm25_tpu.index.snapshot import load_snapshot, save_snapshot

__all__ = [
    "BuildStats", "build_index",
    "MMapCorpus", "load_index", "save_corpus", "save_index",
    "load_snapshot", "save_snapshot",
]

"""Merging per-host partial indexes into one global index.

Completes the multi-host (DCN) build path (SURVEY.md section 5): each host
tokenizes and scores its contiguous doc range (parallel.distributed.
DocShardPlan), producing a partial ScoredIndex with a host-local vocab;
``merge_shard_indexes`` re-maps vocabularies onto a shared global vocab,
offsets doc ids, recomputes the corpus-global DF/IDF, and re-scores — so
the merged index is bit-identical to a single-host build over the full
corpus (tested in tests/test_merge.py).

Why re-score: BM25 weights depend on corpus-global statistics (df, N,
avgdl), which no shard knows alone.  Shards therefore carry raw term
frequencies; the cheap global pass is vectorized NumPy over the combined
COO triplets.
"""

from __future__ import annotations

import numpy as np

from bm25_tpu.scoring import BM25Params, ScoredIndex, build_scored_index
from bm25_tpu.text.tokenizer import TokenizedCorpus


def merge_tokenized_shards(shards: list[TokenizedCorpus]) -> TokenizedCorpus:
    """Concatenate per-host tokenized shards under one global vocab."""
    global_vocab: dict[str, int] = {}
    ids: list[np.ndarray] = []
    for shard in shards:
        remap = np.empty(max(len(shard.vocab), 1), dtype=np.int32)
        for term, tid in shard.vocab.items():
            gid = global_vocab.get(term)
            if gid is None:
                gid = len(global_vocab)
                global_vocab[term] = gid
            remap[tid] = gid
        ids.extend(remap[doc] for doc in shard.ids)
    return TokenizedCorpus(ids=ids, vocab=global_vocab)


def merge_shard_indexes(
    shards: list[TokenizedCorpus], params: BM25Params | None = None
) -> ScoredIndex:
    """Global scored index from per-host tokenized shards (order = doc order)."""
    merged = merge_tokenized_shards(shards)
    return build_scored_index(
        merged.ids,
        vocab_size=len(merged.vocab),
        params=params,
        vocab=merged.vocab,
    )

"""Streaming index builder parity with one-shot build."""

import numpy as np

from bm25_tpu.index.builder import build_index
from bm25_tpu.index.streaming import StreamingIndexBuilder


def test_streaming_matches_oneshot(zipf_corpus_small):
    one, _ = build_index(zipf_corpus_small)

    sb = StreamingIndexBuilder()
    sb.add(zipf_corpus_small[:100])
    sb.add(zipf_corpus_small[100:250])
    sb.add(zipf_corpus_small[250:])
    streamed, stats = sb.finalize()

    assert stats.num_docs == one.num_docs
    assert streamed.vocab_size == one.vocab_size
    assert streamed.nnz == one.nnz
    # same vocab id assignment (first-occurrence order is chunk-stable)
    assert streamed.vocab == one.vocab
    np.testing.assert_array_equal(streamed.indptr, one.indptr)
    np.testing.assert_array_equal(streamed.indices, one.indices)
    np.testing.assert_array_equal(streamed.data, one.data)


def test_streaming_add_iter(animal_corpus):
    sb = StreamingIndexBuilder()
    sb.add_iter(iter(animal_corpus), chunk_size=2)
    idx, stats = sb.finalize()
    assert idx.num_docs == 4 and idx.nnz == 20

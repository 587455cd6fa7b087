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


def test_streaming_spill_to_disk_matches_in_ram(tmp_path, zipf_corpus_small):
    """spill_dir keeps accumulation RAM O(chunk): identical index bytes."""
    from bm25_tpu.index.streaming import StreamingIndexBuilder
    from bm25_tpu.text.tokenizer import Tokenizer

    def build(**kw):
        b = StreamingIndexBuilder(
            tokenizer=Tokenizer(stopwords=None, stemmer=None), **kw
        )
        for i in range(0, len(zipf_corpus_small), 40):
            b.add(zipf_corpus_small[i : i + 40])
        return b.finalize()[0]

    ram = build()
    spilled = build(spill_dir=str(tmp_path / "spill"), spill_threshold_bytes=256)
    assert (tmp_path / "spill" / "tokens.bin").exists()
    np.testing.assert_array_equal(ram.indptr, spilled.indptr)
    np.testing.assert_array_equal(ram.indices, spilled.indices)
    np.testing.assert_allclose(ram.data, spilled.data)
    assert ram.vocab == spilled.vocab
    np.testing.assert_array_equal(ram.doc_lengths, spilled.doc_lengths)


def test_streaming_spill_truncates_stale_file(tmp_path, zipf_corpus_small):
    """A tokens.bin left by a previous run must not leak into a new build."""
    from bm25_tpu.index.streaming import StreamingIndexBuilder
    from bm25_tpu.text.tokenizer import Tokenizer

    d = tmp_path / "spill"
    d.mkdir()
    (d / "tokens.bin").write_bytes(b"\xff" * 4096)  # stale garbage

    b = StreamingIndexBuilder(
        tokenizer=Tokenizer(stopwords=None, stemmer=None),
        spill_dir=str(d), spill_threshold_bytes=256,
    )
    b.add(zipf_corpus_small[:60])
    b.add(zipf_corpus_small[60:120])
    idx = b.finalize()[0]

    b2 = StreamingIndexBuilder(tokenizer=Tokenizer(stopwords=None, stemmer=None))
    b2.add(zipf_corpus_small[:60])
    b2.add(zipf_corpus_small[60:120])
    ref = b2.finalize()[0]
    np.testing.assert_array_equal(idx.indptr, ref.indptr)
    np.testing.assert_array_equal(idx.indices, ref.indices)
    np.testing.assert_allclose(idx.data, ref.data)

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
        spilled_tokens = b._spilled_tokens + sum(len(c) for c in b._chunks)
        idx, _ = b.finalize()
        if kw.get("spill_dir"):
            assert spilled_tokens > 0  # the spill path actually engaged
        return idx

    ram = build()
    spilled = build(spill_dir=str(tmp_path / "spill"), spill_threshold_bytes=256)
    import os
    # the consumed spill stream is cleaned up at finalize
    assert os.listdir(tmp_path / "spill") == []
    np.testing.assert_array_equal(ram.indptr, spilled.indptr)
    np.testing.assert_array_equal(ram.indices, spilled.indices)
    np.testing.assert_allclose(ram.data, spilled.data)
    assert ram.vocab == spilled.vocab
    np.testing.assert_array_equal(ram.doc_lengths, spilled.doc_lengths)


def test_streaming_spill_truncates_stale_file(tmp_path, zipf_corpus_small):
    """A stale spill file at the same path must not leak into a new build
    (the per-builder unique name makes collisions rare; the first-spill
    truncation covers a pid/id reuse)."""
    from bm25_tpu.index.streaming import StreamingIndexBuilder
    from bm25_tpu.text.tokenizer import Tokenizer

    d = tmp_path / "spill"
    d.mkdir()

    b = StreamingIndexBuilder(
        tokenizer=Tokenizer(stopwords=None, stemmer=None),
        spill_dir=str(d), spill_threshold_bytes=256,
    )
    # plant stale garbage at this builder's OWN spill path
    import pathlib
    pathlib.Path(b._spill_path).write_bytes(b"\xff" * 4096)
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


def test_streaming_two_builders_share_spill_dir(tmp_path, zipf_corpus_small):
    """Two builders spilling into ONE directory must not corrupt each
    other's stream (the old fixed tokens.bin name truncated/interleaved)."""
    from bm25_tpu.index.streaming import StreamingIndexBuilder
    from bm25_tpu.text.tokenizer import Tokenizer

    d = str(tmp_path / "spill")
    mk = lambda: StreamingIndexBuilder(  # noqa: E731
        tokenizer=Tokenizer(stopwords=None, stemmer=None),
        spill_dir=d, spill_threshold_bytes=256,
    )
    a, b = mk(), mk()
    # interleave adds so both spill while the other is mid-stream
    for i in range(0, 120, 40):
        a.add(zipf_corpus_small[i : i + 40])
        b.add(zipf_corpus_small[120 - i - 40 : 120 - i])
    ia = a.finalize()[0]

    ref = StreamingIndexBuilder(
        tokenizer=Tokenizer(stopwords=None, stemmer=None))
    for i in range(0, 120, 40):
        ref.add(zipf_corpus_small[i : i + 40])
    ir = ref.finalize()[0]
    np.testing.assert_array_equal(ia.indptr, ir.indptr)
    np.testing.assert_array_equal(ia.indices, ir.indices)
    np.testing.assert_allclose(ia.data, ir.data)


def test_snapshot_round_trips_idf_method(tmp_path):
    """idf_method must survive the snapshot: dropping it silently changes
    effective_idf_method for every rescoring consumer."""
    from bm25_tpu.index.snapshot import load_snapshot, save_snapshot
    from bm25_tpu.scoring import BM25Params, build_scored_index

    ids = [np.array([0, 1, 2], np.int32), np.array([1, 1, 3], np.int32)]
    idx = build_scored_index(
        ids, vocab_size=4,
        params=BM25Params(method="bm25+", idf_method="lucene"),
    )
    p = tmp_path / "snap"
    save_snapshot(p, idx)
    loaded = load_snapshot(p)
    assert loaded.params.idf_method == "lucene"
    assert loaded.params.effective_idf_method == "lucene"

"""Index save/load round-trip and bm25s-format compatibility."""

import json
import os

import numpy as np
import pytest

from bm25_tpu.index.builder import build_index
from bm25_tpu.index.io import MMapCorpus, load_index, save_index
from bm25_tpu.reference import ReferenceEngine


def test_load_bundled_reference_index(reference_index_dir, reference_artifacts):
    idx = load_index(reference_index_dir)
    assert idx.num_docs == 4
    assert idx.vocab_size == 20
    np.testing.assert_array_equal(idx.data, reference_artifacts["data"])
    assert idx.params.method == "lucene"
    # "" pad symbol is stripped from the in-memory vocab
    assert "" not in idx.vocab
    assert idx.vocab["cat"] == 2


def test_search_on_loaded_reference_index(reference_index_dir):
    idx = load_index(reference_index_dir)
    eng = ReferenceEngine.from_scored_index(idx)
    # query: "does the fish purr like a cat?" -> fish(17) purr(16) like(0) cat(2)
    q = np.array([[17, 16, 0, 2]], dtype=np.int32)
    docs, scores = eng.search(q, top_k=2)
    assert docs[0, 0] == 0  # the cat document wins
    assert scores[0, 0] > scores[0, 1] > 0


def test_round_trip(tmp_path, animal_corpus):
    index, stats = build_index(
        animal_corpus, save_to=str(tmp_path / "idx"), save_corpus=True
    )
    assert stats.num_docs == 4 and stats.nnz == 20

    loaded = load_index(str(tmp_path / "idx"))
    np.testing.assert_array_equal(loaded.data, index.data)
    np.testing.assert_array_equal(loaded.indices, index.indices)
    np.testing.assert_array_equal(loaded.indptr, index.indptr)
    np.testing.assert_array_equal(loaded.doc_lengths, index.doc_lengths)
    assert loaded.vocab == index.vocab
    assert loaded.params == index.params

    # required artifact set on disk (reference layout)
    files = set(os.listdir(tmp_path / "idx"))
    for required in [
        "data.csc.index.npy", "indices.csc.index.npy", "indptr.csc.index.npy",
        "vocab.index.json", "params.index.json",
        "corpus.jsonl", "corpus.mmindex.json",
    ]:
        assert required in files

    # vocab json carries the "" pad symbol like bm25s
    vocab_json = json.load(open(tmp_path / "idx" / "vocab.index.json"))
    assert vocab_json[""] == len(index.vocab)


def test_mmap_corpus_seek(tmp_path, animal_corpus):
    build_index(animal_corpus, save_to=str(tmp_path / "idx"))
    corpus = MMapCorpus.open(str(tmp_path / "idx"))
    assert len(corpus) == 4
    assert corpus[2]["text"] == animal_corpus[2]
    assert corpus[2]["id"] == 2
    batch = corpus.batch([3, 0])
    assert [b["id"] for b in batch] == [3, 0]


def test_mmindex_offsets_match_reference_convention(tmp_path, animal_corpus,
                                                    reference_artifacts):
    build_index(animal_corpus, save_to=str(tmp_path / "idx"))
    offsets = json.load(open(tmp_path / "idx" / "corpus.mmindex.json"))
    assert offsets == reference_artifacts["mmindex"]


def test_save_index_keeps_int64_indptr_above_int32_nnz(tmp_path, monkeypatch):
    """nnz >= 2^31 must not silently wrap indptr to int32 (ADVICE r1)."""
    import json
    from unittest import mock

    import numpy as np

    from bm25_tpu.index.io import load_index, save_index
    from bm25_tpu.scoring import BM25Params, ScoredIndex

    idx = ScoredIndex(
        indptr=np.array([0, 1, 2, 3], dtype=np.int64),
        indices=np.array([0, 1, 0], dtype=np.int32),
        data=np.array([1.0, 2.0, 3.0], dtype=np.float32),
        num_docs=2,
        doc_lengths=np.array([2, 1], dtype=np.int32),
        params=BM25Params(),
        vocab={"a": 0, "b": 1, "c": 2},
    )
    with mock.patch.object(
        type(idx), "nnz", new_callable=mock.PropertyMock, return_value=2**31 + 7
    ):
        save_index(tmp_path / "big", idx)
    out = np.load(tmp_path / "big" / "indptr.csc.index.npy")
    assert out.dtype == np.int64
    with open(tmp_path / "big" / "params.index.json") as f:
        assert json.load(f)["int_dtype"] == "int64"
    # normal-size indices still save int32 (bm25s byte compatibility)
    save_index(tmp_path / "small", idx)
    out = np.load(tmp_path / "small" / "indptr.csc.index.npy")
    assert out.dtype == np.int32
    loaded = load_index(tmp_path / "small")
    np.testing.assert_array_equal(loaded.indptr, idx.indptr)


def test_build_index_parallel_workers_bit_exact(animal_corpus):
    """workers>1 (spawned shard tokenize + merge) matches the serial build."""
    import numpy as np

    from bm25_tpu.index.builder import build_index

    corpus = list(animal_corpus) * 3  # 12 docs, 2 workers
    ser, _ = build_index(corpus)
    par, _ = build_index(corpus, workers=2)
    assert par.vocab == ser.vocab
    np.testing.assert_array_equal(par.indptr, ser.indptr)
    np.testing.assert_array_equal(par.indices, ser.indices)
    np.testing.assert_array_equal(par.data, ser.data)


def test_mmap_corpus_batch_rejects_out_of_range(tmp_path, animal_corpus):
    """batch() must bounds-check like __getitem__: the engines' -1
    shortfall sentinel (or any stale id) would otherwise silently return
    the WRONG document (offsets[-1] is the last line)."""
    build_index(animal_corpus, save_to=str(tmp_path / "idx"))
    corpus = MMapCorpus.open(str(tmp_path / "idx"))
    with pytest.raises(IndexError):
        corpus.batch([-1])
    with pytest.raises(IndexError):
        corpus.batch([0, len(corpus)])
    with pytest.raises(IndexError):
        corpus[-1]


def test_build_index_parallel_accepts_tuple_stopwords(animal_corpus):
    """A tuple stopwords spec (supported by get_stopwords) must ride the
    parallel path and produce the bit-exact serial result."""
    from bm25_tpu.text.tokenizer import Tokenizer

    stop = ("a", "is", "the")
    i1, _ = build_index(animal_corpus,
                        tokenizer=Tokenizer(stopwords=stop), workers=2)
    i2, _ = build_index(animal_corpus,
                        tokenizer=Tokenizer(stopwords=stop), workers=1)
    np.testing.assert_array_equal(i1.data, i2.data)
    np.testing.assert_array_equal(i1.indices, i2.indices)
    np.testing.assert_array_equal(i1.indptr, i2.indptr)


def test_load_index_mmap_mode(reference_index_dir):
    """mmap=True (the bm25s ``BM25.load(..., mmap=True)`` analog,
    ``/root/reference/bm25_test.py:40``) maps the npy triplet read-only;
    contents and search results are identical to the eager load."""
    eager = load_index(reference_index_dir)
    mapped = load_index(reference_index_dir, mmap=True)
    for name in ("data", "indices", "indptr"):
        arr = getattr(mapped, name)
        assert isinstance(arr, np.memmap), name
        # read-only mapping: nothing downstream may mutate the triplet
        with pytest.raises(ValueError):
            arr[0] = 0
        np.testing.assert_array_equal(arr, getattr(eager, name))
    assert mapped.vocab == eager.vocab and mapped.params == eager.params

    # the host oracle (and thus every engine builder, which only reads
    # the same arrays) works straight off the mapping
    eng_m = ReferenceEngine.from_scored_index(mapped)
    eng_e = ReferenceEngine.from_scored_index(eager)
    q = np.array([[17, 16, 0, 2]], dtype=np.int32)
    dm, sm = eng_m.search(q, top_k=3)
    de, se = eng_e.search(q, top_k=3)
    np.testing.assert_array_equal(dm, de)
    np.testing.assert_array_equal(sm, se)


def test_retriever_load_mmap(tmp_path, animal_corpus):
    """Retriever.load(mmap=True) serves identical results to the eager
    load through the public text-query boundary."""
    from bm25_tpu.retriever import Retriever

    texts = [" ".join(doc) for doc in animal_corpus]
    r0 = Retriever.fit(texts)
    r0.save(str(tmp_path / "idx"))
    eager = Retriever.load(str(tmp_path / "idx"))
    mapped = Retriever.load(str(tmp_path / "idx"), mmap=True)
    assert isinstance(mapped.index.data, np.memmap)
    de, se = eager.retrieve(["does the fish purr like a cat?"], k=3)
    dm, sm = mapped.retrieve(["does the fish purr like a cat?"], k=3)
    np.testing.assert_array_equal(dm, de)
    np.testing.assert_array_equal(sm, se)

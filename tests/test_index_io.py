"""Index save/load round-trip and bm25s-format compatibility."""

import json
import os

import numpy as np

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

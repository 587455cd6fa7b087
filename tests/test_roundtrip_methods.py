"""Disk round-trip + engine parity for every scoring method, and misc
coverage: unicode corpora, tree top-k on non-last axes."""

import jax.numpy as jnp
import numpy as np
import pytest

from bm25_tpu.index.io import load_index, save_index
from bm25_tpu.models.dense import DenseEngine
from bm25_tpu.reference import ReferenceEngine
from bm25_tpu.scoring import METHODS, BM25Params, build_scored_index
from bm25_tpu.text.tokenizer import Tokenizer


@pytest.mark.parametrize("method", METHODS)
def test_save_load_engine_parity_all_methods(tmp_path, zipf_corpus_small, method):
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab),
                             params=BM25Params(method=method), vocab=out.vocab)
    d = str(tmp_path / method.replace("+", "plus"))
    save_index(d, idx)
    loaded = load_index(d)
    assert loaded.params.method == method

    rng = np.random.default_rng(1)
    q = rng.integers(-1, idx.vocab_size, size=(4, 5), dtype=np.int32)
    e1 = ReferenceEngine.from_scored_index(idx)
    e2 = ReferenceEngine.from_scored_index(loaded)
    d1, s1 = e1.search(q, top_k=7)
    d2, s2 = e2.search(q, top_k=7)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_unicode_corpus_round_trip(tmp_path):
    docs = [
        "наука о данных и поиск",
        "机器学习 与 信息检索",
        "café au lait and naïve retrieval",
        "plain ascii document about retrieval",
    ]
    tok = Tokenizer(use_native=False)  # python path handles full unicode
    out = tok.tokenize_corpus(docs)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab), vocab=out.vocab)
    d = str(tmp_path / "uni")
    save_index(d, idx, corpus=docs)
    loaded = load_index(d)
    assert loaded.vocab == idx.vocab
    from bm25_tpu.index.io import MMapCorpus

    corpus = MMapCorpus.open(d)
    assert corpus[1]["text"] == docs[1]

    eng = DenseEngine.from_scored_index(loaded)
    q = tok.tokenize_queries(["café retrieval"], loaded.vocab)
    dd, ss = eng.search(q, top_k=2)
    assert dd.shape == (1, 2)
    assert ss[0, 0] > 0


def test_tree_topk_non_last_axis_and_smallest():
    from bm25_tpu.ops.topk import top_k

    rng = np.random.default_rng(6)
    x = rng.random((6000, 3)).astype(np.float32)
    v, i = top_k(jnp.asarray(x), 5, axis=0, implementation="tree")
    exp_i = np.argsort(-x, axis=0, kind="stable")[:5]
    np.testing.assert_array_equal(np.asarray(i), exp_i)

    v, i = top_k(jnp.asarray(x.T), 5, axis=-1, largest=False,
                 implementation="tree")
    exp_i = np.argsort(x.T, axis=-1, kind="stable")[:, :5]
    np.testing.assert_array_equal(np.asarray(i), exp_i)

"""Scorer math parity: bit-exact vs the bundled bm25s index, plus oracle tests."""

import numpy as np
import pytest

from bm25_tpu.reference import ReferenceEngine, topk_descending
from bm25_tpu.scoring import BM25Params, build_scored_index
from bm25_tpu.text.tokenizer import Tokenizer


def build_animal_index(animal_corpus, ref_vocab):
    """Build our index using the reference's exact vocab ids."""
    tok = Tokenizer()
    vocab = {k: v for k, v in ref_vocab.items() if k != ""}
    out = tok.tokenize_corpus(animal_corpus, vocab=dict(vocab))
    return build_scored_index(
        out.ids, vocab_size=len(vocab), params=BM25Params(), vocab=vocab
    )


def test_lucene_scores_bit_exact_vs_reference(animal_corpus, reference_artifacts):
    idx = build_animal_index(animal_corpus, reference_artifacts["vocab"])
    np.testing.assert_array_equal(idx.indptr, reference_artifacts["indptr"])
    np.testing.assert_array_equal(idx.indices, reference_artifacts["indices"])
    # float32 bit-exactness of the precomputed scores
    np.testing.assert_array_equal(idx.data, reference_artifacts["data"])


def test_params_match_reference(reference_artifacts):
    p = BM25Params()
    rp = reference_artifacts["params"]
    assert (p.k1, p.b, p.delta) == (rp["k1"], rp["b"], rp["delta"])
    assert p.method == rp["method"] == "lucene"
    assert p.effective_idf_method == rp["idf_method"]


def test_classic_method_matches_reference_dense_bm25(fox_corpus):
    """method='classic' reproduces /root/reference/bm25.py:96-121 exactly."""
    docs = [d.lower().split() for d in fox_corpus]
    vocab = {t: i for i, t in enumerate(sorted({w for d in docs for w in d}))}
    ids = [np.array([vocab[w] for w in d], dtype=np.int32) for d in docs]
    idx = build_scored_index(ids, vocab_size=len(vocab),
                             params=BM25Params(method="classic"))
    dense = idx.to_csc().toarray()

    # independent re-derivation of bm25.py's formula
    N, V = len(docs), len(vocab)
    tf = np.zeros((N, V), dtype=np.float32)
    for i, d in enumerate(docs):
        for w in d:
            tf[i, vocab[w]] += 1
    dl = np.array([len(d) for d in docs], dtype=np.float32)
    avgdl = dl.mean()
    df = (tf > 0).sum(axis=0)
    idf = np.log((N - df + 0.5) / (df + 0.5) + 1)
    norm = 1.5 * (1 - 0.75 + 0.75 * dl / avgdl)
    expected = tf * 2.5 / (tf + norm[:, None]) * idf[None, :]
    np.testing.assert_allclose(dense, expected.astype(np.float32), rtol=1e-6)


@pytest.mark.parametrize("method", ["lucene", "robertson", "atire", "bm25l", "bm25+"])
def test_methods_produce_finite_scores(zipf_corpus_small, method):
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab),
                             params=BM25Params(method=method))
    assert np.isfinite(idx.data).all()
    eng = ReferenceEngine.from_scored_index(idx)
    q = np.array([[0, 1, 2, -1]], dtype=np.int32)
    docs, scores = eng.search(q, top_k=5)
    assert docs.shape == (1, 5) and np.isfinite(scores).all()


def test_reference_engine_search_matches_bruteforce(zipf_corpus_small):
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    eng = ReferenceEngine.from_scored_index(idx)
    dense = idx.to_csc().toarray()

    rng = np.random.default_rng(0)
    Q, T, k = 8, 6, 10
    queries = rng.integers(-1, len(out.vocab), size=(Q, T), dtype=np.int32)
    docs, scores = eng.search(queries, top_k=k)
    for i in range(Q):
        q = queries[i][queries[i] >= 0]
        expected = dense[:, q].sum(axis=1)
        ed, es = topk_descending(expected, k)
        np.testing.assert_array_equal(docs[i], ed)
        np.testing.assert_allclose(scores[i], es, rtol=1e-5)


def test_topk_descending_tie_break_smaller_index_first():
    s = np.array([1.0, 3.0, 3.0, 0.5, 3.0])
    idx, vals = topk_descending(s, 3)
    np.testing.assert_array_equal(idx, [1, 2, 4])
    np.testing.assert_array_equal(vals, [3.0, 3.0, 3.0])


def test_reference_engine_rejects_out_of_range_token(animal_corpus):
    tok = Tokenizer()
    out = tok.tokenize_corpus(animal_corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    eng = ReferenceEngine.from_scored_index(idx)
    with pytest.raises(ValueError, match="out of range"):
        eng.search(np.array([[9999]], dtype=np.int32), top_k=1)


def test_direct_csc_build_matches_scipy(zipf_corpus_small):
    """The sort-based CSC construction equals scipy's COO->CSC conversion."""
    import scipy.sparse as sp

    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))

    # independent scipy-based tf/df computation
    rows, cols = [], []
    for d, toks in enumerate(out.ids):
        rows.extend([d] * len(toks))
        cols.extend(toks.tolist())
    tf = sp.coo_matrix(
        (np.ones(len(rows)), (rows, cols)),
        shape=(len(out.ids), len(out.vocab)),
    ).tocsc()
    tf.sum_duplicates()
    tf.sort_indices()
    np.testing.assert_array_equal(idx.indptr, tf.indptr.astype(idx.indptr.dtype))
    np.testing.assert_array_equal(idx.indices, tf.indices.astype(np.int32))


def test_build_flat_validates_lengths():
    from bm25_tpu.scoring import build_scored_index_flat

    with pytest.raises(ValueError, match="doc lengths sum"):
        build_scored_index_flat(
            np.array([0, 1, 2], dtype=np.int64),
            np.array([2, 2], dtype=np.int32),
        )


def test_build_empty_corpus():
    from bm25_tpu.scoring import build_scored_index_flat

    idx = build_scored_index_flat(
        np.zeros(0, np.int64), np.zeros(0, np.int32), vocab_size=5
    )
    assert idx.num_docs == 0 and idx.nnz == 0 and idx.vocab_size == 5


def test_params_reject_out_of_range_hyperparameters():
    import pytest

    from bm25_tpu.scoring import BM25Params

    with pytest.raises(ValueError, match="b must"):
        BM25Params(b=1.5)
    with pytest.raises(ValueError, match="k1 must"):
        BM25Params(k1=-1)
    with pytest.raises(ValueError, match="delta must"):
        BM25Params(delta=-0.1)
    with pytest.raises(ValueError, match="idf_method"):
        BM25Params(idf_method="nope")


def test_zero_offset_methods_build_with_none_token_offsets():
    """Fresh builds match reloaded ones: lucene (zero-offset) indexes carry
    token_offsets=None, not an all-zero array that save/load would
    normalize away."""
    import numpy as np

    from bm25_tpu.scoring import BM25Params, build_scored_index

    ids = [np.array([0, 1], np.int32), np.array([1, 2], np.int32)]
    assert build_scored_index(ids, vocab_size=3).token_offsets is None
    off = build_scored_index(
        ids, vocab_size=3, params=BM25Params(method="bm25+")
    ).token_offsets
    assert off is not None and np.any(off)

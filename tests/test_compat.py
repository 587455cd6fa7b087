"""Drop-in compat classes vs the reference's documented behaviour."""

import numpy as np
import scipy.sparse as sp

from bm25_tpu.compat import BM25, BM25v


def test_bm25_fit_get_top_n_matches_reference_math(fox_corpus):
    """Cross-check against an independent dense re-derivation of
    /root/reference/bm25.py:96-121 on the reference's demo corpus."""
    tokenizer = lambda x: x.lower().split()
    corpus = [tokenizer(d) for d in fox_corpus]
    m = BM25()
    m.fit(corpus)

    N, V = len(corpus), len(m.vocabulary)
    tf = np.zeros((N, V), np.float32)
    for i, d in enumerate(corpus):
        for w in d:
            tf[i, m.term_to_id[w]] += 1
    dl = np.array([len(d) for d in corpus], np.float32)
    df = (tf > 0).sum(0)
    idf = np.log((N - df + 0.5) / (df + 0.5) + 1)
    norm = 1.5 * (1 - 0.75 + 0.75 * dl / dl.mean())
    expected = tf * 2.5 / (tf + norm[:, None]) * idf[None, :]
    np.testing.assert_allclose(m.bm25_matrix, expected, rtol=1e-5, atol=1e-6)

    query = tokenizer("sleeping rabbit")
    scores = m.get_scores(query)
    exp_scores = expected[:, [m.term_to_id[t] for t in query]].sum(1)
    np.testing.assert_allclose(scores, exp_scores, rtol=1e-5, atol=1e-6)

    top = m.get_top_n(query, fox_corpus, n=3)
    assert top[0][1] == "The brown fox watches the sleeping rabbit"


def test_bm25_empty_and_oov():
    m = BM25()
    m.fit([])
    assert m.get_top_n(["x"], [], 5) == []
    m.fit([["alpha", "beta"]])
    assert (m.get_scores(["zzz"]) == 0).all()
    assert m.get_top_n(["alpha"], [["alpha", "beta"]], 0) == []


def test_bm25v_index_search_roundtrip():
    rng = np.random.default_rng(0)
    dense = (rng.random((30, 12)) * (rng.random((30, 12)) > 0.6)).astype(np.float32)
    m = BM25v()
    m.index(sp.csc_matrix(dense), np.full(30, 5, dtype=np.int32))
    queries = np.array([[0, 3, -1], [5, 5, 11]], dtype=np.int32)
    docs, scores = m.search(queries, top_k=4)
    assert docs.shape == (2, 4)
    expected0 = dense[:, [0, 3]].sum(1)
    np.testing.assert_allclose(scores[0, 0], expected0.max(), rtol=1e-5)
    # duplicate token counts twice (reference bm25_native.py:152 semantics)
    expected1 = dense[:, 5] * 2 + dense[:, 11]
    np.testing.assert_allclose(scores[1, 0], expected1.max(), rtol=1e-5)


def test_bm25v_empty_query_batch():
    m = BM25v()
    m.index(sp.csc_matrix(np.eye(3, dtype=np.float32)), np.ones(3, np.int32))
    docs, scores = m.search(np.zeros((0, 2), np.int32), top_k=2)
    # (0, k_eff): empty batches concatenate cleanly with non-empty ones
    assert docs.shape == (0, 2) and scores.shape == (0, 2)


def test_fit_empty_corpus_resets_previous_state():
    from bm25_tpu.compat import BM25

    m = BM25()
    m.fit([["brown", "fox"], ["lazy", "dog"]])
    assert m.get_scores(["fox"]).shape == (2,)
    m.fit([])
    assert m.corpus_size == 0 and m.term_to_id == {}
    import numpy as np

    np.testing.assert_array_equal(m.get_scores(["fox"]), np.zeros(0))


def test_reference_topk_zero_k():
    import numpy as np

    from bm25_tpu.reference import topk_descending

    idx, vals = topk_descending(np.array([3.0, 1.0, 2.0]), 0)
    assert idx.size == 0 and vals.size == 0

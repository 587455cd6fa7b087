"""Dense device engine vs the CPU oracle (runs on the simulated CPU backend)."""

import numpy as np
import pytest

from conftest import strict_positions

from bm25_tpu.models.dense import DenseEngine
from bm25_tpu.reference import ReferenceEngine
from bm25_tpu.scoring import BM25Params, build_scored_index
from bm25_tpu.text.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def small_setup(request):
    corpus = request.getfixturevalue("zipf_corpus_small")
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    dense = DenseEngine.from_scored_index(idx)
    oracle = ReferenceEngine.from_scored_index(idx)
    return idx, dense, oracle


def test_dense_matches_oracle_topk(small_setup):
    idx, dense, oracle = small_setup
    rng = np.random.default_rng(42)
    queries = rng.integers(-1, idx.vocab_size, size=(16, 7), dtype=np.int32)
    k = 20
    dd, ds = dense.search(queries, top_k=k)
    od, os_ = oracle.search(queries, top_k=k)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    # doc ids must agree wherever scores are not tied at the boundary
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])


def test_dense_full_scores_match_oracle(small_setup):
    idx, dense, oracle = small_setup
    q = np.array([0, 3, 9, -1], dtype=np.int32)
    np.testing.assert_allclose(
        dense.get_scores(q), oracle.get_scores(q), rtol=1e-5, atol=1e-6
    )


def test_dense_animal_end_to_end(animal_corpus):
    tok = Tokenizer()
    out = tok.tokenize_corpus(animal_corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab), vocab=out.vocab)
    dense = DenseEngine.from_scored_index(idx)
    q = tok.tokenize_queries(["does the fish purr like a cat?"], out.vocab)
    docs, scores = dense.search(q, top_k=2)
    assert docs[0, 0] == 0
    assert scores[0, 0] == pytest.approx(1.5877, abs=1e-3)


def test_dense_oov_only_query(small_setup):
    idx, dense, _ = small_setup
    docs, scores = dense.search(np.full((2, 4), -1, dtype=np.int32), top_k=3)
    np.testing.assert_array_equal(scores, 0.0)
    np.testing.assert_array_equal(docs, [[0, 1, 2], [0, 1, 2]])


def test_dense_rejects_out_of_range(small_setup):
    idx, dense, _ = small_setup
    with pytest.raises(ValueError, match="out of range"):
        dense.search(np.array([[idx.vocab_size]], dtype=np.int32), top_k=1)


def test_dense_k_clamped_to_num_docs(small_setup):
    idx, dense, _ = small_setup
    docs, scores = dense.search(np.array([[0, 1]], dtype=np.int32),
                                top_k=idx.num_docs + 50)
    assert docs.shape == (1, idx.num_docs)
    # padded doc columns must never appear
    assert docs.max() < idx.num_docs


def test_dense_empty_batch(small_setup):
    _, dense, _ = small_setup
    docs, scores = dense.search(np.zeros((0, 3), dtype=np.int32), top_k=5)
    # (0, k_eff): an empty batch concatenates cleanly with non-empty ones
    k_eff = min(5, dense.num_docs)
    assert docs.shape == (0, k_eff) and scores.shape == (0, k_eff)


@pytest.mark.parametrize("method", ["bm25l", "bm25+"])
def test_dense_nonoccurrence_methods_match_oracle(zipf_corpus_small, method):
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab),
                             params=BM25Params(method=method))
    dense = DenseEngine.from_scored_index(idx)
    oracle = ReferenceEngine.from_scored_index(idx)
    q = np.array([[1, 5, 8, -1, -1]], dtype=np.int32)
    dd, ds = dense.search(q, top_k=10)
    od, os_ = oracle.search(q, top_k=10)
    np.testing.assert_allclose(ds, os_, rtol=1e-5)
    np.testing.assert_array_equal(dd, od)


def test_dense_bf16_matrix(small_setup):
    import jax.numpy as jnp

    idx, _, oracle = small_setup
    eng = DenseEngine.from_scored_index(idx, dtype=jnp.bfloat16)
    q = np.array([[0, 3, 9, -1]], dtype=np.int32)
    dd, ds = eng.search(q, top_k=10)
    od, os_ = oracle.search(q, top_k=10)
    np.testing.assert_allclose(ds, os_, rtol=2e-2, atol=1e-2)


def test_dense_search_pipelined_matches_search(small_setup):
    idx, dense, oracle = small_setup
    rng = np.random.default_rng(77)
    queries = rng.integers(-1, idx.vocab_size, size=(40, 5), dtype=np.int32)
    d1, s1 = dense.search(queries, top_k=9)
    d2, s2 = dense.search_pipelined(queries, top_k=9, batch=16)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_short_queries_share_one_compiled_shape(request):
    """T <= 8 queries pad to one (q_pad, 8) shape: a single jit entry serves
    them all (serving latency stability; see serve --warmup-top-k)."""
    import numpy as np

    from bm25_tpu.models.dense import DenseEngine
    from bm25_tpu.runtime.session import Session
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    corpus = request.getfixturevalue("animal_corpus")
    out = Tokenizer().tokenize_corpus(corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    eng = DenseEngine.from_scored_index(idx, session=Session())
    n0 = len(eng.session._cache)
    for t in (1, 3, 8):
        eng.search(np.zeros((2, t), np.int32), top_k=2)
    assert len(eng.session._cache) == n0 + 1  # one compiled step for all
    eng.search(np.zeros((2, 9), np.int32), top_k=2)  # > 8 -> new shape
    assert len(eng.session._cache) == n0 + 2


def test_matmul_scoring_variant_matches_gather(request):
    """Full-vocab SpGEMM variant (reference bm25_native.py:160-192)."""
    from bm25_tpu.models.dense import DenseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    corpus = request.getfixturevalue("zipf_corpus_small")
    out = Tokenizer(stopwords=None, stemmer=None).tokenize_corpus(corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    g = DenseEngine.from_scored_index(idx)
    m = DenseEngine.from_scored_index(idx)
    m.scoring = "matmul"
    rng = np.random.default_rng(13)
    queries = rng.integers(-1, idx.vocab_size, size=(10, 6), dtype=np.int32)
    dg, sg = g.search(queries, top_k=12)
    dm, sm = m.search(queries, top_k=12)
    np.testing.assert_allclose(sm, sg, rtol=2e-4, atol=1e-5)
    same = np.isclose(sg, sm, rtol=2e-4, atol=1e-5)
    assert same.all()
    # doc agreement wherever scores are strictly ordered
    from conftest import strict_positions
    strict = strict_positions(sg)
    np.testing.assert_array_equal(dm[strict], dg[strict])


def test_dense_weighted_search_matches_oracle(small_setup):
    """Float per-token weights through gather and matmul scoring paths."""
    idx, dense, oracle = small_setup
    rng = np.random.default_rng(31)
    queries = rng.integers(-1, idx.vocab_size, size=(9, 6), dtype=np.int32)
    weights = rng.uniform(0.1, 3.0, size=queries.shape).astype(np.float32)
    od, os_ = oracle.search(queries, top_k=7, weights=weights)
    dd, ds = dense.search(queries, top_k=7, weights=weights)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=2e-5)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])
    with pytest.raises(ValueError, match="weights shape"):
        dense.search(queries, top_k=3, weights=weights[:, :2])

    mm = DenseEngine.from_scored_index(idx)
    mm.scoring = "matmul"
    md, ms = mm.search(queries, top_k=7, weights=weights)
    np.testing.assert_allclose(ms, os_, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(md[strict], od[strict])

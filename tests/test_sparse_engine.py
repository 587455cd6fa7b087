"""Sparse ELL engine vs the CPU oracle."""

import numpy as np
import pytest

from conftest import strict_positions

from bm25_tpu.models.sparse import SparseEngine, build_ell_buckets
from bm25_tpu.reference import ReferenceEngine
from bm25_tpu.scoring import build_scored_index
from bm25_tpu.text.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def setup(request):
    corpus = request.getfixturevalue("zipf_corpus_small")
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    oracle = ReferenceEngine.from_scored_index(idx)
    return idx, oracle


def test_ell_buckets_cover_all_docs_and_nnz(setup):
    idx, _ = setup
    buckets = build_ell_buckets(idx, max_buckets=4)
    total_docs = sum(b.num_real for b in buckets)
    assert total_docs == idx.num_docs
    seen = np.concatenate([b.doc_ids[b.doc_ids >= 0] for b in buckets])
    assert len(np.unique(seen)) == idx.num_docs
    # every stored (doc, token, score) triple matches the CSC
    csr = idx.to_csc().tocsr()
    nnz = 0
    for b in buckets:
        for row in range(b.num_real):
            d = b.doc_ids[row]
            mask = b.tok[row] >= 0
            nnz += int(mask.sum())
            toks = b.tok[row][mask]
            vals = b.val[row][mask]
            lo, hi = csr.indptr[d], csr.indptr[d + 1]
            np.testing.assert_array_equal(np.sort(toks), np.sort(csr.indices[lo:hi]))
            np.testing.assert_allclose(np.sort(vals), np.sort(csr.data[lo:hi]))
    assert nnz == idx.nnz


@pytest.mark.parametrize("max_buckets", [1, 2, 4])
def test_sparse_matches_oracle(setup, max_buckets):
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, max_buckets=max_buckets)
    rng = np.random.default_rng(5)
    queries = rng.integers(-1, idx.vocab_size, size=(12, 6), dtype=np.int32)
    k = 15
    dd, ds = eng.search(queries, top_k=k)
    od, os_ = oracle.search(queries, top_k=k)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])


def test_sparse_duplicate_query_tokens_count_per_occurrence(setup):
    """A repeated query token contributes once per occurrence, matching the
    reference's per-column gather+sum (bm25_native.py:152)."""
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx)
    q = np.array([[3, 3, 7, -1]], dtype=np.int32)
    dd, ds = eng.search(q, top_k=5)
    od, os_ = oracle.search(q, top_k=5)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)


def test_sparse_animal_end_to_end(animal_corpus):
    tok = Tokenizer()
    out = tok.tokenize_corpus(animal_corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab), vocab=out.vocab)
    eng = SparseEngine.from_scored_index(idx)
    q = tok.tokenize_queries(["does the fish purr like a cat?"], out.vocab)
    docs, scores = eng.search(q, top_k=2)
    assert docs[0, 0] == 0
    assert scores[0, 0] == pytest.approx(1.5877, abs=1e-3)


def test_sparse_oov_only(setup):
    idx, _ = setup
    eng = SparseEngine.from_scored_index(idx)
    docs, scores = eng.search(np.full((1, 3), -1, dtype=np.int32), top_k=4)
    np.testing.assert_array_equal(scores, 0.0)
    assert (docs >= 0).all()


def test_sparse_bf16_values(setup):
    """bf16 postings values: half the memory, scores within bf16 tolerance."""
    import jax.numpy as jnp

    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, dtype=jnp.bfloat16)
    q = np.array([[0, 1, 2, -1]], dtype=np.int32)
    dd, ds = eng.search(q, top_k=10)
    od, os_ = oracle.search(q, top_k=10)
    np.testing.assert_allclose(ds, os_, rtol=2e-2, atol=1e-2)


def test_hot_cold_split_matches_no_split(setup):
    """Hot/cold split is a pure layout change: same results as hot_tokens=0."""
    idx, oracle = setup
    eng_split = SparseEngine.from_scored_index(
        idx, hot_tokens=64, hot_budget_bytes=1 << 20
    )
    eng_plain = SparseEngine.from_scored_index(idx, hot_tokens=0)
    assert eng_split.hot_h == 64 and eng_plain.hot_h == 0
    rng = np.random.default_rng(21)
    q = rng.integers(-1, idx.vocab_size, size=(9, 6), dtype=np.int32)
    d1, s1 = eng_split.search(q, top_k=12)
    d2, s2 = eng_plain.search(q, top_k=12)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
    od, os_ = oracle.search(q, top_k=12)
    np.testing.assert_allclose(s1, os_, rtol=1e-5, atol=1e-6)


def test_hot_split_covers_all_hot_query(setup):
    """A query made entirely of hot tokens scores purely via the MXU path."""
    from bm25_tpu.models.sparse import split_hot_cold

    idx, oracle = setup
    hot_ids, cold_csr, hot_dense = split_hot_cold(idx, 16)
    # postings conservation: hot + cold == total
    assert int((hot_dense != 0).sum()) + cold_csr.nnz == idx.nnz
    eng = SparseEngine.from_scored_index(idx, hot_tokens=16,
                                          hot_budget_bytes=1 << 20)
    q = np.array([hot_ids[:4].tolist()], dtype=np.int32)
    d, s = eng.search(q, top_k=5)
    od, os_ = oracle.search(q, top_k=5)
    np.testing.assert_allclose(s, os_, rtol=1e-5, atol=1e-6)


def test_split_precision_hot_representation(setup):
    """bf16 high + bf16 residual reconstructs hot scores to ~1e-5 relative."""
    import jax.numpy as jnp

    idx, _ = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens=32,
                                         hot_budget_bytes=1 << 20)
    for b in eng.buckets:
        hi = np.asarray(b["hotT"], dtype=np.float32)
        lo = np.asarray(b["hotLo"], dtype=np.float32)
        recon = hi + lo
        # compare against the exact hot matrix rebuilt from the index
        from bm25_tpu.models.sparse import split_hot_cold
        hot_ids, _, hot_dense = split_hot_cold(idx, eng.hot_h)
        real = np.asarray(b["doc_ids"]) >= 0
        exact = np.zeros_like(recon)
        exact[:, real] = hot_dense[np.asarray(b["doc_ids"])[real]].T
        denom = np.maximum(np.abs(exact), 1e-3)
        assert (np.abs(recon - exact) / denom).max() < 3e-5


def test_short_queries_share_one_compiled_shape(setup):
    """The t_pad floor of 8 applies to the sparse engine too."""
    import numpy as np

    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.runtime.session import Session

    idx, _ = setup
    eng = SparseEngine.from_scored_index(idx, session=Session())
    n0 = len(eng.session._cache)
    for t in (2, 5, 8):
        eng.search(np.zeros((3, t), np.int32), top_k=3)
    assert len(eng.session._cache) == n0 + 1


# -- three-tier (hot / mid ELL / tail candidates) scoring ----------------------


def test_three_tier_matches_oracle(setup):
    """Force all three tiers active and check exact parity vs the oracle."""
    idx, oracle = setup
    df = idx.df()
    # tail_cap at the median DF -> some cold tokens stay in the mid ELL
    cap = int(np.median(df[df > 0]))
    eng = SparseEngine.from_scored_index(idx, hot_tokens=4, tail_cap=cap)
    assert eng.hot_h == 4
    assert eng.tail_docs is not None
    assert any("tokT" in b for b in eng.buckets), "mid tier should be active"
    rng = np.random.default_rng(7)
    queries = rng.integers(-1, idx.vocab_size, size=(16, 7), dtype=np.int32)
    for k in (3, 25):
        dd, ds = eng.search(queries, top_k=k)
        od, os_ = oracle.search(queries, top_k=k)
        np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
        strict = strict_positions(os_)
        np.testing.assert_array_equal(dd[strict], od[strict])


def test_tail_only_no_mid_ell(setup):
    """With a large tail_cap the mid tier disappears: no ELL arrays at all."""
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens=8, tail_cap=1 << 30)
    assert all("tokT" not in b for b in eng.buckets)
    assert len(eng.buckets) == 1
    # identity bucket: original doc order (tie contract by construction)
    did = np.asarray(eng.buckets[0]["doc_ids"])
    np.testing.assert_array_equal(
        did[: idx.num_docs], np.arange(idx.num_docs)
    )
    rng = np.random.default_rng(8)
    queries = rng.integers(-1, idx.vocab_size, size=(12, 6), dtype=np.int32)
    dd, ds = eng.search(queries, top_k=20)
    od, os_ = oracle.search(queries, top_k=20)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])


def test_tail_disabled_matches_oracle(setup):
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, tail_cap=0)
    assert eng.tail_docs is None
    rng = np.random.default_rng(9)
    queries = rng.integers(-1, idx.vocab_size, size=(8, 6), dtype=np.int32)
    dd, ds = eng.search(queries, top_k=10)
    od, os_ = oracle.search(queries, top_k=10)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)


def test_sparse_tie_contract_smallest_doc_id():
    """Equal scores must resolve to ascending doc ids (VERDICT r1 item 10:
    the old engine resolved ties in permuted-bucket order)."""
    corpus = ["identical words here"] * 37  # every doc scores the same
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    q = np.array([[0, 1]], dtype=np.int32)
    for kwargs in (
        {"tail_cap": 4096},
        {"tail_cap": 0},
        {"tail_cap": 1, "hot_tokens": 1, "max_buckets": 3},
    ):
        eng = SparseEngine.from_scored_index(idx, **kwargs)
        dd, ds = eng.search(q, top_k=9)
        assert len(set(ds[0].tolist())) == 1, kwargs  # all tied
        np.testing.assert_array_equal(dd[0], np.arange(9)), kwargs


def test_unpacked_result_path_matches_packed(setup):
    """num_docs >= 2^24 switches to the two-fetch int32 result path; force
    it small-scale and check identical results (VERDICT r1 item 6)."""
    from unittest import mock

    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx)
    rng = np.random.default_rng(10)
    queries = rng.integers(-1, idx.vocab_size, size=(9, 5), dtype=np.int32)
    d_packed, s_packed = eng.search(queries, top_k=12)
    assert eng._pack_results
    with mock.patch.object(
        type(eng), "_pack_results", new_callable=mock.PropertyMock,
        return_value=False,
    ):
        d_unpacked, s_unpacked = eng.search(queries, top_k=12)
    np.testing.assert_array_equal(d_packed, d_unpacked)
    np.testing.assert_array_equal(s_packed, s_unpacked)
    assert d_unpacked.dtype == np.int32


def test_tail_excludes_negative_value_tokens():
    """Tokens with negative contributions (robertson IDF at DF > N/2) must
    stay out of the tail tier — the exact-merge proof needs tail >= 0."""
    from bm25_tpu.models.sparse import build_token_tail
    from bm25_tpu.scoring import BM25Params

    rng = np.random.default_rng(11)
    ids = [rng.integers(0, 12, size=6).astype(np.int32) for _ in range(30)]
    # token 0 in (almost) every doc -> df > N/2 -> negative robertson idf
    for a in ids[:28]:
        a[0] = 0
    idx = build_scored_index(
        ids, vocab_size=12, params=BM25Params(method="robertson")
    )
    tail, is_tail = build_token_tail(idx, np.zeros(0, np.int32), tail_cap=1 << 30)
    df = idx.df()
    neg_tokens = [
        v for v in range(12)
        if df[v] and idx.data[idx.indptr[v]:idx.indptr[v + 1]].min() < 0
    ]
    assert neg_tokens, "test needs at least one negative-IDF token"
    for v in neg_tokens:
        assert not is_tail[v]
    # and the engine still matches the oracle on that method
    eng = SparseEngine.from_scored_index(idx)
    oracle = ReferenceEngine.from_scored_index(idx)
    q = rng.integers(-1, 12, size=(8, 4), dtype=np.int32)
    dd, ds = eng.search(q, top_k=6)
    od, os_ = oracle.search(q, top_k=6)
    # negative tokens ride the hot tier's bf16 hi+lo representation
    # (~2^-16 relative error)
    np.testing.assert_allclose(ds, os_, rtol=2e-4, atol=1e-5)


def test_score_dtype_bfloat16_same_docs(setup):
    """bf16 result transfer: identical doc selection, rounded scores."""
    idx, oracle = setup
    f32 = SparseEngine.from_scored_index(idx)
    b16 = SparseEngine.from_scored_index(idx, score_dtype="bfloat16")
    rng = np.random.default_rng(12)
    queries = rng.integers(-1, idx.vocab_size, size=(10, 6), dtype=np.int32)
    d1, s1 = f32.search(queries, top_k=15)
    d2, s2 = b16.search(queries, top_k=15)
    np.testing.assert_array_equal(d1, d2)  # selection is f32 on device
    assert s2.dtype == np.float32  # returned as f32 values
    np.testing.assert_allclose(s1, s2, rtol=8e-3, atol=1e-3)


def test_tail_engine_device_checkpoint_roundtrip(tmp_path, setup):
    from bm25_tpu.index.device_checkpoint import (
        load_device_checkpoint, save_device_checkpoint)

    idx, _ = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens=4, tail_cap=1 << 30)
    assert eng.tail_docs is not None
    q = np.array([[0, 2, 5, -1]], dtype=np.int32)
    d1, s1 = eng.search(q, top_k=6)
    save_device_checkpoint(tmp_path / "tail_ck", eng)
    eng2 = load_device_checkpoint(tmp_path / "tail_ck")
    assert eng2.tail_docs is not None and eng2.tail_cap == 1 << 30
    d2, s2 = eng2.search(q, top_k=6)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2)


def test_score_buffer_budget_scales_with_resident_index(setup, monkeypatch):
    """The transient-buffer budget shrinks when the resident index leaves
    little HBM headroom (device OOM crashes the worker, it doesn't raise)."""
    idx, _ = setup
    eng = SparseEngine.from_scored_index(idx)
    assert eng.score_buffer_budget <= 4 << 30
    # a tiny index keeps the full default
    assert eng.score_buffer_budget > 1 << 30


def test_weighted_search_matches_oracle(setup):
    """Float per-token weights through all tiers vs the weighted oracle."""
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens=8)
    rng = np.random.default_rng(21)
    queries = rng.integers(-1, idx.vocab_size, size=(9, 6), dtype=np.int32)
    weights = rng.uniform(0.1, 3.0, size=queries.shape).astype(np.float32)
    dd, ds = eng.search(queries, top_k=7, weights=weights)
    od, os_ = oracle.search(queries, top_k=7, weights=weights)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=2e-5)
    strict = strict_positions(os_)
    for i in np.flatnonzero(strict.all(axis=1)):
        assert set(dd[i].tolist()) == set(od[i].tolist())


def test_weighted_search_integer_weights_tie_exact(setup):
    """Integer weights == repeating the token that many times (per-occurrence
    semantics), with exact doc-id tie order."""
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens=8)
    q = np.array([[0, 3, 7, -1]], dtype=np.int32)
    w = np.array([[2.0, 1.0, 3.0, 0.0]], dtype=np.float32)
    # expand to the equivalent repeated-token query
    q_rep = np.array([[0, 0, 3, 7, 7, 7, -1, -1]], dtype=np.int32)
    dd, ds = eng.search(q, top_k=9, weights=w)
    dr, sr = eng.search(q_rep, top_k=9)
    np.testing.assert_allclose(ds, sr, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(dd, dr)
    od, os_ = oracle.search(q_rep, top_k=9)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(dd, od)


def test_weighted_search_with_tail_tier(setup):
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens=8, tail_cap=3)
    assert eng.tail_docs is not None
    rng = np.random.default_rng(22)
    queries = rng.integers(-1, idx.vocab_size, size=(6, 5), dtype=np.int32)
    weights = rng.uniform(0.0, 2.0, size=queries.shape).astype(np.float32)
    dd, ds = eng.search(queries, top_k=6, weights=weights)
    od, os_ = oracle.search(queries, top_k=6, weights=weights)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError, match="negative query weights"):
        eng.search(queries, top_k=3, weights=-weights)


def test_dedup_query_rows():
    from bm25_tpu.models.sparse import dedup_query_rows

    q = np.array(
        [[5, 3, 5, 5, -1, 3], [7, -1, -1, -1, -1, -1], [-1] * 6],
        dtype=np.int32,
    )
    ids_u, counts = dedup_query_rows(q)
    # row 0: {3: 2, 5: 3}; order within the row is not part of the contract
    got0 = {int(i): float(c) for i, c in zip(ids_u[0], counts[0]) if i >= 0}
    assert got0 == {3: 2.0, 5: 3.0}
    got1 = {int(i): float(c) for i, c in zip(ids_u[1], counts[1]) if i >= 0}
    assert got1 == {7: 1.0}
    assert (ids_u[2] == -1).all() and counts[2][ids_u[2] >= 0].size == 0


def test_long_query_dedup_matches_undeduped(setup):
    """dedup_queries='auto' engages for wide queries and is exact."""
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens=8)
    rng = np.random.default_rng(23)
    # long queries with heavy repetition (few distinct tokens)
    base = rng.integers(0, idx.vocab_size, size=(7, 6))
    pick = rng.integers(0, 6, size=(7, 48))
    queries = np.take_along_axis(
        np.broadcast_to(base, (7, 6)).astype(np.int32), pick, axis=1
    )
    queries[:, -3:] = -1  # pads
    assert queries.shape[1] >= eng.dedup_min_width
    dd, ds = eng.search(queries, top_k=8)
    eng_no = SparseEngine.from_scored_index(idx, hot_tokens=8)
    eng_no.dedup_queries = False
    dn, sn = eng_no.search(queries, top_k=8)
    np.testing.assert_allclose(ds, sn, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(dd, dn)
    od, os_ = oracle.search(queries, top_k=8)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(dd, od)


def test_choose_hot_tokens_cost_model(setup):
    from bm25_tpu.models.sparse import choose_hot_tokens

    idx, _ = setup
    # zero budget -> no hot tier
    assert choose_hot_tokens(idx, budget_bytes=0) == 0
    # unconstrained: returns a candidate within vocab, deterministic
    h1 = choose_hot_tokens(idx)
    h2 = choose_hot_tokens(idx)
    assert h1 == h2 and 0 <= h1 <= idx.vocab_size
    # a budget that fits exactly h=64 rows caps the choice
    h3 = choose_hot_tokens(idx, budget_bytes=64 * idx.num_docs * 4)
    assert h3 <= 64


def test_auto_hot_tokens_engine_matches_oracle(setup):
    """hot_tokens='auto' (the default) builds a correct engine."""
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens="auto")
    rng = np.random.default_rng(41)
    queries = rng.integers(-1, idx.vocab_size, size=(8, 5), dtype=np.int32)
    dd, ds = eng.search(queries, top_k=9)
    od, os_ = oracle.search(queries, top_k=9)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=2e-5)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])


def test_search_ids_rankings_only(setup):
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens=8)
    rng = np.random.default_rng(51)
    queries = rng.integers(-1, idx.vocab_size, size=(9, 6), dtype=np.int32)
    docs = eng.search_ids(queries, top_k=7)
    assert docs.dtype == np.int32 and docs.shape == (9, 7)
    full_docs, _ = eng.search(queries, top_k=7)
    np.testing.assert_array_equal(docs, full_docs)
    # weighted variant too
    w = rng.uniform(0.5, 2.0, size=queries.shape).astype(np.float32)
    dw = eng.search_ids(queries, top_k=7, weights=w)
    fw, _ = eng.search(queries, top_k=7, weights=w)
    np.testing.assert_array_equal(dw, fw)


def test_cold_width_routing_matches_oracle(setup):
    """route_cold=True (forced) reorders + strips hot tokens exactly."""
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens=32)
    eng.route_cold = True
    rng = np.random.default_rng(61)
    queries = rng.integers(-1, idx.vocab_size, size=(40, 8), dtype=np.int32)
    queries[0] = -1  # all-pad row
    dd, ds = eng.search(queries, top_k=9)
    od, os_ = oracle.search(queries, top_k=9)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=2e-5)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])
    # weighted through the routed path too
    w = rng.uniform(0.2, 2.0, size=queries.shape).astype(np.float32)
    dw, sw = eng.search(queries, top_k=9, weights=w)
    ow, osw = oracle.search(queries, top_k=9, weights=w)
    np.testing.assert_allclose(sw, osw, rtol=5e-5, atol=5e-5)
    strict = strict_positions(osw)
    np.testing.assert_array_equal(dw[strict], ow[strict])


def test_dedup_plus_cold_routing_matches_oracle(setup):
    """Auto dedup (wide repetitive queries) composed with forced routing."""
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens=32)
    eng.route_cold = True
    rng = np.random.default_rng(81)
    base = rng.integers(0, idx.vocab_size, size=(36, 5))
    pick = rng.integers(0, 5, size=(36, 24))
    queries = np.take_along_axis(
        np.broadcast_to(base, (36, 5)).astype(np.int32), pick, axis=1
    )
    queries[0] = -1
    assert queries.shape[1] >= eng.dedup_min_width
    dd, ds = eng.search(queries, top_k=9)
    od, os_ = oracle.search(queries, top_k=9)
    np.testing.assert_allclose(ds, os_, rtol=5e-5, atol=5e-5)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])
    np.testing.assert_array_equal(eng.search_ids(queries, top_k=9), dd)


def test_auto_hot_respects_tail_cap_disjointness(setup):
    """ADVICE r2: with auto hot sizing + a tail tier, the BUILT hot set must
    stay within the df > tail_cap tokens the cost model considered."""
    from bm25_tpu.models.sparse import choose_hot_tokens

    idx, oracle = setup
    df = idx.df()
    # a cap high enough that only a handful of tokens sit above it
    cap = int(np.sort(df)[-5])
    n_above = int((df > cap).sum())
    assert n_above < 8  # the model unconstrained would propose h >= 64
    h_model = choose_hot_tokens(idx, tail_cap=cap)
    assert h_model <= n_above
    eng = SparseEngine.from_scored_index(
        idx, hot_tokens="auto", tail_cap=cap
    )
    assert eng.hot_h <= n_above
    if eng.hot_h > 0:
        hot_ids = np.flatnonzero(np.asarray(eng.hot_table)[:-1] >= 0)
        assert (df[hot_ids] > cap).all()
    # and it still scores exactly
    rng = np.random.default_rng(11)
    queries = rng.integers(-1, idx.vocab_size, size=(8, 6), dtype=np.int32)
    dd, ds = eng.search(queries, top_k=10)
    od, os_ = oracle.search(queries, top_k=10)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)


def test_union_selection_matches_per_bucket(setup):
    """Union group selection (one global tournament) must be bit-equal to
    the per-bucket path, including on degenerate all-tied corpora (where
    the exactness flag trips and lax.cond falls back)."""
    idx, oracle = setup
    rng = np.random.default_rng(21)
    queries = rng.integers(-1, idx.vocab_size, size=(24, 7), dtype=np.int32)
    for k in (5, 40):
        e_u = SparseEngine.from_scored_index(idx, max_buckets=4)
        e_u.union_select = True
        e_p = SparseEngine.from_scored_index(idx, max_buckets=4)
        assert not e_p.union_select  # default off (slower in-step on chip)
        du, su = e_u.search(queries, top_k=k)
        dp, sp = e_p.search(queries, top_k=k)
        np.testing.assert_array_equal(du, dp)
        np.testing.assert_array_equal(su, sp)

    # degenerate ties: every doc identical -> every group max ties theta,
    # the union flag must trip and the fallback must keep the doc-id order
    ids = [np.array([0, 1], np.int32)] * 64
    from bm25_tpu.scoring import build_scored_index

    tied = build_scored_index(ids, vocab_size=4)
    eng = SparseEngine.from_scored_index(tied, max_buckets=2)
    eng.union_select = True
    d, s = eng.search(np.array([[0, 1]], np.int32), top_k=10)
    np.testing.assert_array_equal(d[0], np.arange(10))
    assert np.allclose(s[0], s[0][0])


def test_chunk_bounds_dp_never_splits_below_align():
    """DP chunk plans must cover all rows with pow2-padded, q_align-rounded
    chunks and be no worse than fixed slicing under the model."""
    from bm25_tpu.models.sparse import _chunk_bounds_dp

    rng = np.random.default_rng(0)
    for n, max_q, q_align in [(2048, 512, 8), (100, 512, 8), (7, 512, 8),
                              (513, 128, 16), (2048, 512, 24)]:
        counts = np.sort(rng.integers(0, 9, size=n))
        cls = 1 << np.ceil(np.log2(np.maximum(counts, 2))).astype(np.int64)
        bounds = _chunk_bounds_dp(cls, max_q, q_align, c0_units=20.0)
        assert bounds[0] == 0 and bounds[-1] == n
        sizes = np.diff(bounds)
        assert (sizes > 0).all() and (sizes <= max_q).all()

    # the planner's dispatch path handles a batch where every row is the
    # same class (degenerates to fixed slicing)
    from bm25_tpu.models.sparse import plan_query_dispatch

    qs = rng.integers(0, 64, size=(700, 6)).astype(np.int32)
    hot = np.full(65, -1, np.int32)
    hot[:32] = np.arange(32)
    perm, chunks = plan_query_dispatch(
        qs, None, hot_table_host=hot, hot_h=32, has_scan=True, route=True,
        route_min_queries=32, max_q=256, q_align=8,
    )
    assert sum(c[0] for c in chunks) == 700
    # rows reassemble exactly under the permutation
    total = np.concatenate([c[1][: c[0]] for c in chunks])
    np.testing.assert_array_equal(total[np.argsort(perm, kind="stable")],
                                  np.pad(qs, ((0, 0), (0, 2)),
                                         constant_values=-1))


def test_routed_q_pad_respects_budget():
    """Round-3 review: the pow2 pad floor must never exceed max_q (the
    transient-score budget) — padding above it resurrects the OOM class
    the budget exists to prevent."""
    from bm25_tpu.models.sparse import _routed_q_pad

    assert _routed_q_pad(5, max_q=512, q_align=8) == 32
    assert _routed_q_pad(100, max_q=512, q_align=8) == 128
    # budget below the 32-row floor: stay at/below the budget
    assert _routed_q_pad(5, max_q=8, q_align=8) == 8
    assert _routed_q_pad(20, max_q=24, q_align=8) == 24
    assert _routed_q_pad(16, max_q=24, q_align=8) == 16


# -- filtered search (doc_mask) ---------------------------------------------


def _mask_check(eng, oracle, idx, density, seed=11, k=10, q_n=12,
                weighted=False, **search_kw):
    rng = np.random.default_rng(seed)
    queries = rng.integers(-1, idx.vocab_size, size=(q_n, 6), dtype=np.int32)
    mask = rng.random(idx.num_docs) < density
    w = (rng.uniform(0.2, 3.0, size=queries.shape).astype(np.float32)
         if weighted else None)
    dd, ds = eng.search(queries, top_k=k, weights=w, doc_mask=mask,
                        **search_kw)
    od, os_ = oracle.search(queries, top_k=k, weights=w, doc_mask=mask)
    # weighted paths carry the usual split-bf16 reconstruction noise
    tol = dict(rtol=2e-5, atol=2e-5) if weighted else dict(rtol=1e-5,
                                                           atol=1e-6)
    np.testing.assert_allclose(ds, os_, **tol)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])
    # every returned doc is eligible (or the -1 shortfall sentinel)
    real = dd >= 0
    assert mask[dd[real]].all()
    # the -1/-0 sentinel appears exactly when eligibility runs out
    if not mask.any():
        assert (dd == -1).all() and (ds == 0.0).all()
    return dd, ds


@pytest.mark.parametrize("max_buckets", [1, 4])
def test_sparse_doc_mask_matches_oracle(setup, max_buckets):
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, max_buckets=max_buckets)
    _mask_check(eng, oracle, idx, density=0.5)
    _mask_check(eng, oracle, idx, density=0.5, weighted=True)


def test_sparse_doc_mask_sparse_eligibility(setup):
    """Fewer eligible docs than k: the tail of each row is doc -1/score 0
    on every transfer path (plain, packed runs under 2^24 docs)."""
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx)
    rng = np.random.default_rng(3)
    mask = np.zeros(idx.num_docs, bool)
    mask[rng.choice(idx.num_docs, size=4, replace=False)] = True
    queries = rng.integers(0, idx.vocab_size, size=(6, 6), dtype=np.int32)
    dd, ds = eng.search(queries, top_k=10, doc_mask=mask)
    od, os_ = oracle.search(queries, top_k=10, doc_mask=mask)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(dd == -1, od == -1)
    real = dd >= 0
    assert mask[dd[real]].all()
    # all-False mask: every slot is the sentinel
    dd, ds = eng.search(queries[:2], top_k=5,
                        doc_mask=np.zeros(idx.num_docs, bool))
    assert (dd == -1).all() and (ds == 0.0).all()


def test_sparse_doc_mask_with_hot_tier_and_tail(setup):
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens=8, tail_cap=2)
    _mask_check(eng, oracle, idx, density=0.4, seed=7)


def test_sparse_doc_mask_ids_only_and_routing(setup):
    """search_ids under a mask returns -1 sentinels device-side; a 40-query
    batch also exercises cold-width routed chunks with the mask."""
    idx, oracle = setup
    eng = SparseEngine.from_scored_index(idx, hot_tokens=8)
    rng = np.random.default_rng(13)
    queries = rng.integers(-1, idx.vocab_size, size=(40, 6), dtype=np.int32)
    mask = rng.random(idx.num_docs) < 0.3
    dd = eng.search_ids(queries, top_k=8, doc_mask=mask)
    od, os_ = oracle.search(queries, top_k=8, doc_mask=mask)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])
    np.testing.assert_array_equal(dd == -1, od == -1)


def test_sparse_doc_mask_bad_shape_raises(setup):
    idx, _ = setup
    eng = SparseEngine.from_scored_index(idx)
    q = np.zeros((1, 4), np.int32)
    with pytest.raises(ValueError, match="doc_mask shape"):
        eng.search(q, top_k=3, doc_mask=np.ones(idx.num_docs + 1, bool))


def test_dense_doc_mask_matches_oracle(setup):
    from bm25_tpu.models.dense import DenseEngine

    idx, oracle = setup
    eng = DenseEngine.from_scored_index(idx)
    rng = np.random.default_rng(4)
    queries = rng.integers(-1, idx.vocab_size, size=(9, 5), dtype=np.int32)
    mask = rng.random(idx.num_docs) < 0.4
    dd, ds = eng.search(queries, top_k=12, doc_mask=mask)
    od, os_ = oracle.search(queries, top_k=12, doc_mask=mask)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])
    real = dd >= 0
    assert mask[dd[real]].all()


def test_sparse_doc_mask_tree_selection_path():
    """Masked search through the TREE selection path (bucket rows > 4096):
    the fused kernel's group maxima are emitted post-mask (the mask folds
    into the pad-row mask via a scoring copy of doc_ids), so
    top_k_tree_with_maxes must stay exact under a mask.  The shared small
    fixture (300 docs) only ever hits select_top_k."""
    from conftest import make_zipf_corpus

    corpus = make_zipf_corpus(6000, vocab=900, avg_len=8, seed=21)
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    oracle = ReferenceEngine.from_scored_index(idx)
    eng = SparseEngine.from_scored_index(idx, max_buckets=1)
    rows = eng.buckets[0]["doc_ids"].shape[0]
    k = 12
    assert rows > max(2 * k, 4096), "shape must engage the tree path"
    _mask_check(eng, oracle, idx, density=0.5, seed=17, k=k, q_n=8)
    _mask_check(eng, oracle, idx, density=0.02, seed=18, k=k, q_n=8)


def test_hot_counts_exact_beyond_bf16_integer_range():
    """A hot token repeated > 256 times in one (wide) query must count
    exactly: the bf16 one-hot sum rounds 257 to 256/258, so wide queries
    take the exact scatter-add path.  Dedup is disabled to force the raw
    width through the kernel."""
    import numpy as np

    docs = [np.array([0] * 5 + [1, 2], np.int32),
            np.array([0] * 3 + [2, 3], np.int32),
            np.array([1, 2, 3, 4], np.int32)]
    idx = build_scored_index(docs, vocab_size=5)
    oracle = ReferenceEngine.from_scored_index(idx)
    eng = SparseEngine.from_scored_index(idx, hot_tokens=4)
    eng.dedup_queries = False  # force the raw width through the kernel
    assert eng.hot_h > 0
    q = np.full((2, 300), -1, np.int32)
    q[0, :257] = 0  # 257 repeats of a hot token
    q[1, :2] = [1, 3]
    od, os_ = oracle.search(q, top_k=3)
    dd, ds = eng.search(q, top_k=3)
    np.testing.assert_array_equal(od, dd)
    # ~1e-5 rel = the 3-product bf16-split reconstruction accuracy (same
    # as weighted queries); the bf16 one-hot path was off by ~4e-3 here
    np.testing.assert_allclose(os_, ds, rtol=5e-5, atol=1e-5)


def test_empty_batch_and_k_zero_contract(zipf_corpus_small):
    """Degenerate searches return (Q, k_eff)-shaped results: empty batches
    concatenate cleanly, k<=0 never reaches top-k selection, and the
    ids_only path returns an array (regression: it returned a tuple)."""
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    eng = SparseEngine.from_scored_index(idx)

    docs, scores = eng.search(np.zeros((0, 4), np.int32), top_k=7)
    assert docs.shape == (0, 7) and scores.shape == (0, 7)
    full = eng.search(np.array([[0, 1, 2, 3]], np.int32), top_k=7)
    both = np.concatenate([docs, full[0]])  # the concat use case
    assert both.shape == (1, 7)

    ids = eng.search_ids(np.zeros((0, 4), np.int32), top_k=7)
    assert isinstance(ids, np.ndarray) and ids.shape == (0, 7)

    d0, s0 = eng.search(np.array([[0, 1]], np.int32), top_k=0)
    assert d0.shape == (1, 0) and s0.shape == (1, 0)


def test_zero_doc_engine_returns_empty(tmp_path):
    """An engine over an empty corpus answers searches with zero columns
    instead of crashing in top-k selection (updatable retrievers can be
    searched before any document exists)."""
    idx = build_scored_index([], vocab_size=8)
    eng = SparseEngine.from_scored_index(idx)
    docs, scores = eng.search(np.array([[0, 3]], np.int32), top_k=10)
    assert docs.shape == (1, 0) and scores.shape == (1, 0)

    from bm25_tpu.models.dense import DenseEngine

    deng = DenseEngine.from_scored_index(idx)
    docs, scores = deng.search(np.array([[0, 3]], np.int32), top_k=10)
    assert docs.shape == (1, 0) and scores.shape == (1, 0)


def test_ell_slot_estimate_matches_built_layout():
    """The cost model's slot estimate must track build_ell_buckets_from_csr
    exactly — the auto hot-tier/bucket sizing steers by it (a silent
    divergence mis-sizes layouts with no error)."""
    import scipy.sparse as sp

    from bm25_tpu.models.sparse import (
        _ell_slot_estimate, build_ell_buckets_from_csr)

    rng = np.random.default_rng(0)
    for trial, (d, v, mb, ra) in enumerate([
        (300, 200, 4, 8), (1000, 500, 2, 8), (97, 50, 4, 8),
        (512, 300, 8, 8), (64, 40, 4, 512), (8, 10, 4, 8),
    ]):
        nnz_per_row = np.maximum(1, rng.poisson(
            rng.integers(2, 30), size=d))
        rows, cols, vals = [], [], []
        for r, n in enumerate(nnz_per_row):
            c = rng.choice(v, size=min(n, v), replace=False)
            rows.extend([r] * len(c))
            cols.extend(c.tolist())
            vals.extend([1.0] * len(c))
        csr = sp.csr_matrix(
            (np.asarray(vals, np.float32), (rows, cols)), shape=(d, v)
        )
        buckets = build_ell_buckets_from_csr(
            csr.copy(), d, max_buckets=mb, row_align=ra)
        real = sum(b.tok.shape[0] * b.tok.shape[1] for b in buckets)
        est = _ell_slot_estimate(np.diff(csr.indptr), mb, ra)
        assert est == real, (
            f"trial {trial}: estimate {est} != built {real}"
        )


def _skewed_index(num_docs=6000, vocab=512, seed=3):
    """Zipf-skewed corpus big enough that the auto hot tier engages."""
    from bm25_tpu.scoring import build_scored_index_flat

    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    cum = np.cumsum(p)
    lengths = np.maximum(4, rng.poisson(40, num_docs)).astype(np.int32)
    flat = np.searchsorted(cum, rng.random(int(lengths.sum()))).astype(
        np.int32)
    np.clip(flat, 0, vocab - 1, out=flat)
    return build_scored_index_flat(flat, lengths, vocab_size=vocab)


def test_overhead_target_memory_budget_knob():
    """overhead_target=R caps the device footprint at ~R x raw CSC bytes
    (VERDICT r3 item 4): tighter targets buy smaller hot tiers, the cap is
    honored within 10% whenever a hot tier fits at all, and results stay
    oracle-exact at every point on the dial."""
    from bm25_tpu.models.sparse import SparseEngine

    idx = _skewed_index()
    csc = idx.data.nbytes + idx.indices.nbytes + idx.indptr.nbytes
    oracle = ReferenceEngine.from_scored_index(idx)
    rng = np.random.default_rng(5)
    queries = rng.integers(-1, idx.vocab_size, size=(16, 6), dtype=np.int32)

    engines = {}
    for target in (1.6, 3.0, None):
        eng = SparseEngine.from_scored_index(idx, overhead_target=target)
        ratio = eng.device_bytes() / csc
        if target is not None:
            assert ratio <= target * 1.1, (
                f"target {target}: ratio {ratio:.2f} over cap"
            )
        dd, ds = eng.search(queries, top_k=9)
        od, os_ = oracle.search(queries, top_k=9)
        np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
        engines[target] = (eng.hot_h, ratio)

    # the speed-optimal default must spend at least as much as any capped
    # point, and hot size must grow monotonically with the target
    assert engines[1.6][0] <= engines[3.0][0] <= engines[None][0]
    assert engines[None][0] > 0, (
        "fixture too small: the auto policy never engaged a hot tier, "
        "so the knob test is vacuous"
    )


def test_overhead_target_rejects_explicit_hot_tokens():
    from bm25_tpu.models.sparse import SparseEngine

    idx = _skewed_index(num_docs=200, vocab=64)
    with pytest.raises(ValueError, match="overhead_target"):
        SparseEngine.from_scored_index(idx, hot_tokens=8,
                                       overhead_target=2.0)
    with pytest.raises(ValueError, match="positive"):
        SparseEngine.from_scored_index(idx, overhead_target=-1.0)


def test_overhead_target_below_floor_degrades_to_ell_only():
    """A target below the ELL-only floor cannot be met; the engine must
    degrade to hot_tokens=0 (and warn) instead of failing."""
    from bm25_tpu.models.sparse import SparseEngine

    idx = _skewed_index(num_docs=3000, vocab=256)
    eng = SparseEngine.from_scored_index(idx, overhead_target=0.1)
    assert eng.hot_h == 0
    oracle = ReferenceEngine.from_scored_index(idx)
    q = np.array([[0, 3, 5, -1]], dtype=np.int32)
    dd, ds = eng.search(q, top_k=5)
    od, os_ = oracle.search(q, top_k=5)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)


def test_search_pipelined_matches_search():
    """Double-buffered search returns exactly search()'s results across
    multiple batches, with weights, and in ids_only mode (VERDICT r3
    item 1: the overlap pipeline must not change any contract)."""
    from bm25_tpu.models.sparse import SparseEngine

    idx = _skewed_index(num_docs=800, vocab=128, seed=9)
    eng = SparseEngine.from_scored_index(idx, hot_tokens=16)
    rng = np.random.default_rng(21)
    queries = rng.integers(-1, idx.vocab_size, size=(70, 6), dtype=np.int32)
    d1, s1 = eng.search(queries, top_k=11)
    d2, s2 = eng.search_pipelined(queries, top_k=11, batch=32)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)

    w = rng.uniform(0.5, 2.0, size=queries.shape).astype(np.float32)
    d1, s1 = eng.search(queries, top_k=11, weights=w)
    d2, s2 = eng.search_pipelined(queries, top_k=11, batch=32, weights=w)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)

    ids = eng.search_pipelined(queries, top_k=11, batch=32, ids_only=True)
    np.testing.assert_array_equal(ids, eng.search_ids(queries, top_k=11))

    # empty batch + ragged final batch
    assert eng.search_pipelined(queries[:0], top_k=5)[0].shape == (0, 5)
    d1, _ = eng.search(queries[:33], top_k=11)
    d2, _ = eng.search_pipelined(queries[:33], top_k=11, batch=32)
    np.testing.assert_array_equal(d1, d2)


def test_search_pipelined_bf16_scores_exact_rankings():
    from bm25_tpu.models.sparse import SparseEngine

    idx = _skewed_index(num_docs=500, vocab=96, seed=4)
    eng = SparseEngine.from_scored_index(idx, hot_tokens=0,
                                         score_dtype="bfloat16")
    f32 = SparseEngine.from_scored_index(idx, hot_tokens=0)
    rng = np.random.default_rng(6)
    queries = rng.integers(-1, idx.vocab_size, size=(48, 5), dtype=np.int32)
    d1, s1 = eng.search_pipelined(queries, top_k=9, batch=16)
    d2, s2 = f32.search_pipelined(queries, top_k=9, batch=16)
    np.testing.assert_array_equal(d1, d2)  # selection exact on-device
    np.testing.assert_allclose(s1, s2, rtol=1e-2, atol=1e-2)

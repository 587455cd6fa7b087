"""Randomized cross-engine consistency: every engine vs the host oracle."""

import numpy as np
import pytest

from conftest import make_zipf_corpus, strict_positions

from bm25_tpu.models.dense import DenseEngine
from bm25_tpu.models.sparse import SparseEngine
from bm25_tpu.parallel.mesh import make_mesh
from bm25_tpu.parallel.sharded_engine import ShardedEngine, ShardedSparseEngine
from bm25_tpu.reference import ReferenceEngine
from bm25_tpu.scoring import BM25Params, build_scored_index
from bm25_tpu.text.tokenizer import Tokenizer


def build(seed, method, num_docs=150, vocab=300):
    corpus = make_zipf_corpus(num_docs, vocab=vocab, avg_len=25, seed=seed)
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab),
                             params=BM25Params(method=method))
    return idx


ENGINES = {
    "dense": lambda idx: DenseEngine.from_scored_index(idx),
    "sparse": lambda idx: SparseEngine.from_scored_index(idx),
    "sparse_tail": lambda idx: SparseEngine.from_scored_index(
        idx, hot_tokens=6, tail_cap=1 << 30  # hot + tail, no mid ELL
    ),
    "sparse_3tier": lambda idx: SparseEngine.from_scored_index(
        idx, hot_tokens=4, tail_cap=8  # all three tiers active
    ),
    "sharded": lambda idx: ShardedEngine.from_scored_index(
        idx, mesh=make_mesh(4, data=2)
    ),
    "sharded_sparse": lambda idx: ShardedSparseEngine.from_scored_index(
        idx, mesh=make_mesh(4, data=2)
    ),
}


@pytest.mark.parametrize("engine_name", list(ENGINES))
@pytest.mark.parametrize("seed,method,k", [
    (0, "lucene", 7),
    (1, "robertson", 3),   # negative idf values possible
    (2, "bm25+", 11),      # nonzero token offsets
])
def test_engine_matches_oracle_fuzz(engine_name, seed, method, k):
    idx = build(seed, method)
    oracle = ReferenceEngine.from_scored_index(idx)
    engine = ENGINES[engine_name](idx)
    rng = np.random.default_rng(seed + 100)
    queries = rng.integers(-1, idx.vocab_size, size=(11, 5), dtype=np.int32)
    # some rows fully padded, some with duplicates
    queries[0] = -1
    queries[1, :3] = queries[1, 0]
    dd, ds = engine.search(queries, top_k=k)
    od, os_ = oracle.search(queries, top_k=k)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=1e-5)
    # every engine honors the smallest-doc-id tie contract now (round 2);
    # strict positions exclude only float-accumulation near-ties
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])


@pytest.mark.parametrize("engine_name", list(ENGINES))
@pytest.mark.parametrize("seed,method", [(3, "lucene"), (4, "bm25+")])
def test_weighted_engine_matches_oracle_fuzz(engine_name, seed, method):
    """Float weights through every engine vs the weighted oracle."""
    idx = build(seed, method)
    oracle = ReferenceEngine.from_scored_index(idx)
    engine = ENGINES[engine_name](idx)
    rng = np.random.default_rng(seed + 200)
    queries = rng.integers(-1, idx.vocab_size, size=(9, 5), dtype=np.int32)
    queries[0] = -1
    weights = rng.uniform(0.0, 3.0, size=queries.shape).astype(np.float32)
    dd, ds = engine.search(queries, top_k=6, weights=weights)
    od, os_ = oracle.search(queries, top_k=6, weights=weights)
    np.testing.assert_allclose(ds, os_, rtol=5e-5, atol=5e-5)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])


@pytest.mark.parametrize("engine_name", ["sparse", "sparse_3tier",
                                         "sharded_sparse"])
def test_dedup_and_ids_only_fuzz(engine_name):
    """Wide repetitive queries (auto dedup) and rankings-only parity."""
    idx = build(5, "lucene")
    oracle = ReferenceEngine.from_scored_index(idx)
    engine = ENGINES[engine_name](idx)
    rng = np.random.default_rng(50)
    base = rng.integers(0, idx.vocab_size, size=(7, 4))
    pick = rng.integers(0, 4, size=(7, 20))
    queries = np.take_along_axis(
        np.broadcast_to(base, (7, 4)).astype(np.int32), pick, axis=1
    )
    queries[0] = -1
    dd, ds = engine.search(queries, top_k=6)
    od, os_ = oracle.search(queries, top_k=6)
    np.testing.assert_allclose(ds, os_, rtol=5e-5, atol=5e-5)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])
    ids_only = getattr(engine, "search_ids", None)
    if ids_only is not None:
        np.testing.assert_array_equal(ids_only(queries, top_k=6), dd)

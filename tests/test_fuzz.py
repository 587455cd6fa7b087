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


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_updatable_retriever_state_machine_fuzz(seed):
    """Random add/delete/compact/search sequences against a host model.

    Every added doc carries a unique marker term; at every step, searching
    a marker must return exactly its doc when live and nothing (score 0)
    when deleted, and return_text alignment must hold across compaction
    remaps.  This pins the id/text/tombstone bookkeeping under arbitrary
    op interleavings — the state space unit tests can't enumerate.
    """
    from bm25_tpu.index.updates import UpdatableRetriever

    rng = np.random.default_rng(seed)
    vocab_words = [f"base{i}" for i in range(40)]

    def make_text(marker):
        body = " ".join(rng.choice(vocab_words,
                                   size=int(rng.integers(3, 10))))
        return f"{body} {marker}"

    n0 = 6
    markers = [f"mk{seed}x{i}" for i in range(200)]
    next_marker = n0
    texts = {i: make_text(markers[i]) for i in range(n0)}
    live = set(range(n0))
    marker_of = {i: markers[i] for i in range(n0)}

    r = UpdatableRetriever.fit([texts[i] for i in range(n0)],
                               engine_mode="sparse",
                               max_delta_docs=10_000,   # manual compaction
                               max_deleted_frac=1.1)

    for step in range(30):
        op = rng.choice(["add", "delete", "compact", "check"],
                        p=[0.4, 0.25, 0.1, 0.25])
        if op == "add":
            n_new = int(rng.integers(1, 4))
            batch, batch_markers = [], []
            for _ in range(n_new):
                mk = markers[next_marker]
                next_marker += 1
                batch.append(make_text(mk))
                batch_markers.append(mk)
            ids = r.add_documents(batch)
            for did, mk, tx in zip(ids, batch_markers, batch):
                did = int(did)
                texts[did] = tx
                marker_of[did] = mk
                live.add(did)
        elif op == "delete" and live:
            victims = rng.choice(sorted(live),
                                 size=min(len(live), int(rng.integers(1, 3))),
                                 replace=False)
            if len(live) - len(set(victims.tolist())) == 0:
                continue  # keep >= 1 live doc so compact stays legal
            r.delete_documents([int(v) for v in victims])
            for v in victims:
                live.discard(int(v))
        elif op == "compact":
            if not live:
                continue
            remap = r.compact()
            new_texts, new_markers, new_live = {}, {}, set()
            for old in live:
                new = int(remap[old])
                assert new >= 0, "live doc lost by compaction remap"
                new_texts[new] = texts[old]
                new_markers[new] = marker_of[old]
                new_live.add(new)
            # deleted docs must map to -1
            for old in set(texts) - live:
                if old < len(remap):
                    assert remap[old] == -1
            texts, marker_of, live = new_texts, new_markers, new_live
        else:  # check
            if not live:
                continue
            probe = [int(d) for d in rng.choice(sorted(live),
                     size=min(3, len(live)), replace=False)]
            qs = [marker_of[d] for d in probe]
            docs, scores, out_texts = r.retrieve(qs, k=1, return_text=True)
            for want, got_d, got_s, got_t in zip(
                    probe, docs[:, 0], scores[:, 0], out_texts):
                assert int(got_d) == want, (
                    f"marker routed to doc {got_d}, expected {want}"
                )
                assert got_s > 0
                assert got_t[0] == texts[want]
            # a deleted doc's marker must return nothing
            dead = [d for d in marker_of if d not in live]
            if dead:
                d = int(rng.choice(dead))
                docs, scores = r.retrieve([marker_of[d]], k=1)
                assert int(docs[0, 0]) != d
                assert scores[0, 0] == 0.0

    # final global consistency: every live marker resolves; live count agrees
    assert r.engine.live_docs == len(live)
    for d in sorted(live)[:10]:
        docs, _ = r.retrieve([marker_of[d]], k=1)
        assert int(docs[0, 0]) == d


@pytest.mark.parametrize("engine_name", list(ENGINES))
@pytest.mark.parametrize("seed,density", [(6, 0.5), (7, 0.05)])
def test_masked_weighted_composition_fuzz(engine_name, seed, density):
    """doc_mask x weights x padded/dup queries through every engine family
    vs the masked oracle, including a near-empty allowlist (shortfall
    sentinels) — the composition surface unit tests cover one pair at a
    time."""
    method = "bm25+" if seed % 2 else "lucene"
    idx = build(seed, method)
    oracle = ReferenceEngine.from_scored_index(idx)
    engine = ENGINES[engine_name](idx)
    rng = np.random.default_rng(seed + 300)
    queries = rng.integers(-1, idx.vocab_size, size=(8, 5), dtype=np.int32)
    queries[0] = -1
    queries[1, :3] = queries[1, 0]
    weights = rng.uniform(0.0, 2.5, size=queries.shape).astype(np.float32)
    mask = rng.random(idx.num_docs) < density
    k = 9

    dd, ds = engine.search(queries, top_k=k, weights=weights, doc_mask=mask)
    od, os_ = oracle.search(queries, top_k=k, weights=weights, doc_mask=mask)
    np.testing.assert_allclose(ds, os_, rtol=5e-5, atol=5e-5)
    np.testing.assert_array_equal(dd == -1, od == -1)  # same shortfall
    real = dd >= 0
    assert mask[dd[real]].all(), "ineligible doc returned"
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict & real], od[strict & real])

    # unweighted masked pass on the same mask
    dd, ds = engine.search(queries, top_k=k, doc_mask=mask)
    od, os_ = oracle.search(queries, top_k=k, doc_mask=mask)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(dd == -1, od == -1)


@pytest.fixture(scope="module")
def longdoc_idx():
    """Corpus whose widest ELL bucket exceeds SLOT_TILE: a handful of
    article-length docs (> SLOT_TILE unique terms) among short ones."""
    from bm25_tpu.ops.ell_score import SLOT_TILE

    vocab = 1024
    rng = np.random.default_rng(42)
    docs = [rng.integers(0, vocab, size=int(n)).astype(np.int32)
            for n in rng.integers(4, 20, size=80)]
    for _ in range(6):
        docs.append(rng.choice(vocab, size=SLOT_TILE + 160,
                               replace=False).astype(np.int32))
    return build_scored_index(docs, vocab_size=vocab)


# tier knobs pinned so the widest bucket deterministically exceeds
# SLOT_TILE (auto hot-sizing can absorb a tiny vocab entirely, leaving
# no ELL tier at all — fine in production, defeats this test)
LONGDOC_ENGINES = {
    "dense": lambda idx: DenseEngine.from_scored_index(idx),
    "sparse": lambda idx: SparseEngine.from_scored_index(
        idx, hot_tokens=0, max_buckets=2
    ),
    "sparse_hot": lambda idx: SparseEngine.from_scored_index(
        idx, hot_tokens=64, max_buckets=2
    ),
    "sparse_3tier": lambda idx: SparseEngine.from_scored_index(
        idx, hot_tokens=16, tail_cap=1, max_buckets=2
    ),
    "sharded": lambda idx: ShardedEngine.from_scored_index(
        idx, mesh=make_mesh(4, data=2)
    ),
    "sharded_sparse": lambda idx: ShardedSparseEngine.from_scored_index(
        idx, mesh=make_mesh(4, data=2), hot_tokens=0, max_buckets=2
    ),
}


@pytest.mark.parametrize("engine_name", list(LONGDOC_ENGINES))
def test_longdoc_slot_tiled_composition_fuzz(engine_name, longdoc_idx):
    """weights x doc_mask x padded/dup queries over a corpus that engages
    the slot-tiled kernel path (multi-tile accumulation + the fused
    epilogue on the final tile) in every engine family."""
    from bm25_tpu.ops.ell_score import SLOT_TILE

    idx = longdoc_idx
    oracle = ReferenceEngine.from_scored_index(idx)
    engine = LONGDOC_ENGINES[engine_name](idx)
    buckets = getattr(engine, "buckets", None)
    if buckets is not None:
        widths = [b["tokT"].shape[0] for b in buckets if "tokT" in b]
        assert max(widths) > SLOT_TILE, f"widths {widths} all single-tile"

    rng = np.random.default_rng(43)
    queries = rng.integers(-1, idx.vocab_size, size=(8, 5), dtype=np.int32)
    queries[0] = -1
    queries[1, :3] = queries[1, 0]
    weights = rng.uniform(0.0, 2.5, size=queries.shape).astype(np.float32)
    mask = rng.random(idx.num_docs) < 0.5
    k = 9

    dd, ds = engine.search(queries, top_k=k, weights=weights, doc_mask=mask)
    od, os_ = oracle.search(queries, top_k=k, weights=weights, doc_mask=mask)
    np.testing.assert_allclose(ds, os_, rtol=5e-5, atol=5e-5)
    np.testing.assert_array_equal(dd == -1, od == -1)
    real = dd >= 0
    assert mask[dd[real]].all(), "ineligible doc returned"
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict & real], od[strict & real])

    dd, ds = engine.search(queries, top_k=k)
    od, os_ = oracle.search(queries, top_k=k)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=1e-5)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])

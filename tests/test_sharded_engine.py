"""Multi-chip doc-sharded engine on the simulated 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from conftest import strict_positions

from bm25_tpu.parallel.mesh import make_mesh
from bm25_tpu.parallel.sharded_engine import ShardedEngine, dryrun_sharded_step
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


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("data,docs", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_matches_oracle(setup, data, docs):
    idx, oracle = setup
    mesh = make_mesh(data * docs, data=data)
    eng = ShardedEngine.from_scored_index(idx, mesh=mesh)
    rng = np.random.default_rng(3)
    queries = rng.integers(-1, idx.vocab_size, size=(16, 6), dtype=np.int32)
    k = 17
    dd, ds = eng.search(queries, top_k=k)
    od, os_ = oracle.search(queries, top_k=k)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])


def test_sharded_k_larger_than_shard(setup):
    """k bigger than one shard's doc slice still returns global top-k."""
    idx, oracle = setup
    mesh = make_mesh(8, data=1)
    eng = ShardedEngine.from_scored_index(idx, mesh=mesh)
    # each shard holds ~ceil(300/8)=~40 padded docs; ask for more than a shard
    k = 100
    q = np.array([[0, 1, 2, 3]], dtype=np.int32)
    dd, ds = eng.search(q, top_k=k)
    od, os_ = oracle.search(q, top_k=k)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)


def test_dryrun_hook_all_device_counts():
    for n in (1, 2, 4, 8):
        dryrun_sharded_step(n)


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert len(out) == 2
    g.dryrun_multichip(8)


@pytest.mark.parametrize("data,docs", [(1, 8), (2, 4)])
def test_sharded_sparse_matches_oracle(setup, data, docs):
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

    idx, oracle = setup
    mesh = make_mesh(data * docs, data=data)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh)
    rng = np.random.default_rng(11)
    queries = rng.integers(-1, idx.vocab_size, size=(16, 6), dtype=np.int32)
    k = 13
    dd, ds = eng.search(queries, top_k=k)
    od, os_ = oracle.search(queries, top_k=k)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    # scores sorted desc; sets of docs agree on strict rows
    strict = strict_positions(os_)
    rows_all_strict = strict.all(axis=1)
    for i in np.flatnonzero(rows_all_strict):
        assert set(dd[i].tolist()) == set(od[i].tolist())


def test_sharded_sparse_duplicate_tokens(setup):
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

    idx, oracle = setup
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=make_mesh(4))
    q = np.array([[2, 2, 9, -1]], dtype=np.int32)
    dd, ds = eng.search(q, top_k=5)
    od, os_ = oracle.search(q, top_k=5)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)


def test_sharded_engines_tie_contract_smallest_doc_id():
    """Equal scores resolve to ascending doc ids across shard boundaries
    (doc-ordered rows + stable merge)."""
    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import (
        ShardedEngine, ShardedSparseEngine)
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    corpus = ["identical words here"] * 41
    out = Tokenizer(stopwords=None, stemmer=None).tokenize_corpus(corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    mesh = make_mesh(4)
    q = np.array([[0, 1]], dtype=np.int32)
    for cls in (ShardedEngine, ShardedSparseEngine):
        eng = cls.from_scored_index(idx, mesh=mesh)
        dd, ds = eng.search(q, top_k=9)
        assert len(set(np.asarray(ds[0]).tolist())) == 1, cls
        np.testing.assert_array_equal(dd[0], np.arange(9))


def test_sharded_sparse_multibucket_chunked_matches_oracle():
    """Multi-bucket layout + query chunking: exact parity incl. doc-id ties.

    Forces several real ELL buckets (row_align=8 would need a big corpus;
    instead drop the clamp by building enough docs) and a chunk size
    smaller than the batch so the chunked search path is exercised.
    """
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.reference import ReferenceEngine
    from bm25_tpu.scoring import build_scored_index

    rng = np.random.default_rng(42)
    vocab = 64
    # skewed lengths so length-bucketing actually separates docs; include
    # duplicated docs (exact score ties across bucket boundaries).  Bucket
    # row alignment is 512 x doc shards, so >= 3 x 1024 docs on a 2-shard
    # mesh keeps three real buckets through the small-corpus clamp.
    ids = []
    for i in range(3600):
        n = int(rng.integers(2, 5)) if i % 3 else int(rng.integers(20, 40))
        ids.append(rng.integers(0, vocab, size=n).astype(np.int32))
    for i in range(0, 40, 2):
        ids[i + 1] = ids[i].copy()  # duplicates -> ties
    idx = build_scored_index(ids, vocab_size=vocab)
    mesh = make_mesh(2)
    eng = ShardedSparseEngine.from_scored_index(
        idx, mesh=mesh, max_buckets=3, hot_tokens=8,
    )
    # force multiple buckets at this corpus size (row_align clamp keeps
    # max_buckets when docs are plentiful) and a sub-batch chunk size
    assert len(eng.buckets) >= 2
    eng.chunk_queries = 8
    oracle = ReferenceEngine.from_scored_index(idx)
    queries = rng.integers(-1, vocab, size=(17, 5), dtype=np.int32)
    dd, ds = eng.search(queries, top_k=9)
    od, os_ = oracle.search(queries, top_k=9)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(dd, od)  # exact tie contract


def test_sharded_weighted_search_matches_oracle(setup):
    idx, oracle = setup
    mesh = make_mesh(8, data=2)
    eng = ShardedEngine.from_scored_index(idx, mesh=mesh)
    rng = np.random.default_rng(33)
    queries = rng.integers(-1, idx.vocab_size, size=(8, 5), dtype=np.int32)
    weights = rng.uniform(0.1, 2.5, size=queries.shape).astype(np.float32)
    dd, ds = eng.search(queries, top_k=9, weights=weights)
    od, os_ = oracle.search(queries, top_k=9, weights=weights)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=2e-5)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])


def test_sharded_sparse_weighted_search_matches_oracle(setup):
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

    idx, oracle = setup
    mesh = make_mesh(8, data=2)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh, hot_tokens=8)
    rng = np.random.default_rng(34)
    queries = rng.integers(-1, idx.vocab_size, size=(8, 5), dtype=np.int32)
    weights = rng.uniform(0.1, 2.5, size=queries.shape).astype(np.float32)
    dd, ds = eng.search(queries, top_k=9, weights=weights)
    od, os_ = oracle.search(queries, top_k=9, weights=weights)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=2e-5)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])


def test_sharded_sparse_long_query_dedup_matches_oracle(setup):
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

    idx, oracle = setup
    mesh = make_mesh(8, data=2)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh, hot_tokens=8)
    rng = np.random.default_rng(35)
    base = rng.integers(0, idx.vocab_size, size=(8, 5))
    pick = rng.integers(0, 5, size=(8, 24))
    queries = np.take_along_axis(
        np.broadcast_to(base, (8, 5)).astype(np.int32), pick, axis=1
    )
    assert queries.shape[1] >= eng.dedup_min_width
    dd, ds = eng.search(queries, top_k=9)
    od, os_ = oracle.search(queries, top_k=9)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=2e-5)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])


def test_sharded_sparse_cold_routing_matches_oracle(setup):
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

    idx, oracle = setup
    mesh = make_mesh(8, data=2)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh, hot_tokens=32)
    eng.route_cold = True
    rng = np.random.default_rng(71)
    queries = rng.integers(-1, idx.vocab_size, size=(24, 8), dtype=np.int32)
    queries[0] = -1
    dd, ds = eng.search(queries, top_k=9)
    od, os_ = oracle.search(queries, top_k=9)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=2e-5)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])
    # weighted through the routed sharded path
    w = rng.uniform(0.2, 2.0, size=queries.shape).astype(np.float32)
    dw, sw = eng.search(queries, top_k=9, weights=w)
    ow, osw = oracle.search(queries, top_k=9, weights=w)
    np.testing.assert_allclose(sw, osw, rtol=5e-5, atol=5e-5)
    strict = strict_positions(osw)
    np.testing.assert_array_equal(dw[strict], ow[strict])


def test_k_local_trim_exact_with_fallback(zipf_corpus_small):
    """VERDICT r2 item 7: shard-local candidate trim (k_local < k) must
    stay exact — fast path on ordinary data, full-width fallback on
    planted cross-shard ties at the merge boundary."""
    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import (ShardedSparseEngine,
                                                  choose_k_local)
    from bm25_tpu.reference import ReferenceEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    # policy: no trim below 32 shards, ~2k/S + slack above
    assert choose_k_local(1000, 8) == 1000
    assert choose_k_local(1000, 64) == -(-2000 // 64) + 64

    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    mesh = make_mesh(8)
    oracle = ReferenceEngine.from_scored_index(idx)
    rng = np.random.default_rng(17)
    queries = rng.integers(-1, idx.vocab_size, size=(10, 6), dtype=np.int32)

    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh)
    k = 24
    # force an aggressive trim (m = 2k/S + tiny slack) at 8 shards
    eng.k_local = max(2 * k // 8 + 2, 1)
    dd, ds = eng.search(queries, top_k=k)
    od, os_ = oracle.search(queries, top_k=k)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])

    # degenerate all-tied corpus: every shard's m-th candidate ties the
    # merged k-th -> the exactness flag must trip and the full-width
    # fallback must keep the smaller-doc-id order
    ids = [np.array([0, 1], np.int32)] * 64
    tied = build_scored_index(ids, vocab_size=4)
    te = ShardedSparseEngine.from_scored_index(tied, mesh=mesh)
    te.k_local = 3
    d, s = te.search(np.array([[0, 1]], np.int32), top_k=16)
    np.testing.assert_array_equal(d[0], np.arange(16))
    assert np.allclose(s[0], s[0][0])


def test_k_local_trim_actually_engages(zipf_corpus_small):
    """Round-3 review regression: the step factory's k_local parameter was
    shadowed by a loop variable and the trim compiled to dead code.  The
    trimmed step's jaxpr must contain the exactness-fallback cond; the
    untrimmed step's must not."""
    import jax

    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import make_sharded_ell_step
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    mesh = make_mesh(8)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh)
    ids = np.full((8, 8), -1, np.int32)

    def jaxpr_of(kl):
        step = make_sharded_ell_step(
            mesh, 24, eng.hot_h, eng.buckets, k_local=kl
        )
        return str(jax.make_jaxpr(
            lambda ht, q, *bs: step(ht, q, *bs)
        )(eng.hot_table, ids, *eng.buckets))

    assert "cond" in jaxpr_of(8)       # trim active -> fallback cond
    assert "cond" not in jaxpr_of(None)  # full k -> no trim machinery


# -- filtered search (doc_mask) over the mesh --------------------------------


def test_sharded_dense_doc_mask_matches_oracle(setup):
    idx, oracle = setup
    mesh = make_mesh(8, data=2)
    eng = ShardedEngine.from_scored_index(idx, mesh=mesh)
    rng = np.random.default_rng(21)
    queries = rng.integers(-1, idx.vocab_size, size=(16, 6), dtype=np.int32)
    mask = rng.random(idx.num_docs) < 0.4
    dd, ds = eng.search(queries, top_k=12, doc_mask=mask)
    od, os_ = oracle.search(queries, top_k=12, doc_mask=mask)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])
    real = dd >= 0
    assert mask[dd[real]].all()


def test_sharded_sparse_doc_mask_matches_oracle(setup):
    """Mask through the sharded ELL step: fused kernel buckets, hot tier,
    weighted variant, and the shortfall sentinel after the host qoff add."""
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

    idx, oracle = setup
    mesh = make_mesh(8, data=2)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh, hot_tokens=8)
    rng = np.random.default_rng(22)
    queries = rng.integers(-1, idx.vocab_size, size=(16, 6), dtype=np.int32)
    mask = rng.random(idx.num_docs) < 0.4
    dd, ds = eng.search(queries, top_k=12, doc_mask=mask)
    od, os_ = oracle.search(queries, top_k=12, doc_mask=mask)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])
    real = dd >= 0
    assert mask[dd[real]].all()

    w = rng.uniform(0.2, 3.0, size=queries.shape).astype(np.float32)
    dd, ds = eng.search(queries, top_k=12, weights=w, doc_mask=mask)
    od, os_ = oracle.search(queries, top_k=12, weights=w, doc_mask=mask)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=2e-5)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(dd[strict], od[strict])

    # shortfall: only 3 eligible docs, k=8 -> sentinel tail, scores exactly
    # 0 despite the host-side token-offset add
    tiny = np.zeros(idx.num_docs, bool)
    tiny[rng.choice(idx.num_docs, size=3, replace=False)] = True
    dd, ds = eng.search(queries[:4], top_k=8, doc_mask=tiny)
    od, os_ = oracle.search(queries[:4], top_k=8, doc_mask=tiny)
    np.testing.assert_array_equal(dd == -1, od == -1)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    # ids_only path returns the same sentinels device-side
    di = eng.search_ids(queries[:4], top_k=8, doc_mask=tiny)
    np.testing.assert_array_equal(di == -1, od == -1)


def test_direct_dataclass_construction_searches(setup):
    """The public dataclass constructors work without the private _cache
    kwarg (regression: `_cache: dict = None` crashed on first search)."""
    idx, oracle = setup
    mesh = make_mesh(4, data=1)
    built = ShardedEngine.from_scored_index(idx, mesh=mesh)
    eng = ShardedEngine(
        st=built.st, offsets=built.offsets, num_docs=built.num_docs,
        vocab_size=built.vocab_size, mesh=mesh,
    )
    q = np.array([[0, 1, 2, 3]], dtype=np.int32)
    dd, ds = eng.search(q, top_k=5)
    od, os_ = oracle.search(q, top_k=5)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)

    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

    sbuilt = ShardedSparseEngine.from_scored_index(idx, mesh=mesh,
                                                   hot_tokens=8)
    seng = ShardedSparseEngine(
        buckets=sbuilt.buckets, hot_table=sbuilt.hot_table,
        hot_h=sbuilt.hot_h, offsets=sbuilt.offsets,
        num_docs=sbuilt.num_docs, vocab_size=sbuilt.vocab_size, mesh=mesh,
        hot_table_host=sbuilt.hot_table_host,
    )
    dd, ds = seng.search(q, top_k=5)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)


def test_make_mesh_rejects_oversubscription():
    with pytest.raises(ValueError, match="only 8 devices"):
        make_mesh(16)


def test_cluster_detection_env_markers(monkeypatch):
    from bm25_tpu.parallel import distributed as dist

    for key in dist._CLUSTER_ENVS + ("JAX_NUM_PROCESSES",):
        monkeypatch.delenv(key, raising=False)
    assert not dist._cluster_detected()
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert not dist._cluster_detected()  # single-task slurm job
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert dist._cluster_detected()
    monkeypatch.delenv("SLURM_NTASKS")
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    assert dist._cluster_detected()
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    assert dist._cluster_detected()


def test_sharded_sparse_wide_bucket_slot_tiled(setup):
    """A long-document corpus whose widest ELL bucket exceeds SLOT_TILE
    must run the slot-tiled kernel inside the shard_map local step and
    still match the oracle (the tiling adds a grid axis; the sharded
    step was only ever exercised with single-tile buckets before)."""
    from bm25_tpu.ops.ell_score import SLOT_TILE
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

    vocab = 2048
    rng = np.random.default_rng(5)
    docs = [rng.integers(0, vocab, size=int(n)).astype(np.int32)
            for n in rng.integers(4, 24, size=56)]
    # article-length docs: > SLOT_TILE unique terms each
    for _ in range(8):
        docs.append(rng.choice(vocab, size=SLOT_TILE + 200,
                               replace=False).astype(np.int32))
    idx = build_scored_index(docs, vocab_size=vocab)
    oracle = ReferenceEngine.from_scored_index(idx)

    mesh = make_mesh(8, data=1)
    eng = ShardedSparseEngine.from_scored_index(
        idx, mesh=mesh, hot_tokens=0, max_buckets=2
    )
    widths = [b["tokT"].shape[0] for b in eng.buckets if "tokT" in b]
    assert max(widths) > SLOT_TILE, f"bucket widths {widths} all single-tile"

    queries = rng.integers(-1, vocab, size=(16, 6), dtype=np.int32)
    dd, ds = eng.search(queries, top_k=11)
    od, os_ = oracle.search(queries, top_k=11)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    strict = strict_positions(os_)
    np.testing.assert_array_equal(np.asarray(dd)[strict], od[strict])


def test_bench_step_fn_shares_dispatch_cache(setup):
    """bench_step_fn must plan and compile EXACTLY like _dispatch so the
    shared compile cache can never hand search() a mismatched step
    (ADVICE r3): after bench_step_fn, a search() of the same batch adds
    no new cache entry, and dedup engages identically on wide batches."""
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

    idx, oracle = setup
    mesh = make_mesh(8, data=1)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh)
    rng = np.random.default_rng(11)

    # narrow batch (no dedup)
    queries = rng.integers(-1, idx.vocab_size, size=(16, 6), dtype=np.int32)
    fn, args, n_chunks = eng.bench_step_fn(queries, top_k=9)
    keys_after_bench = set(eng._cache)
    dd, ds = eng.search(queries, top_k=9)
    assert set(eng._cache) == keys_after_bench, (
        "search() compiled a step bench_step_fn did not — the planners "
        "drifted"
    )
    od, os_ = oracle.search(queries, top_k=9)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)

    # wide batch: dedup_queries='auto' engages (width >= dedup_min_width)
    # and introduces count weights — bench_step_fn must mirror that
    wide = np.repeat(
        rng.integers(0, idx.vocab_size, size=(8, 2), dtype=np.int32),
        eng.dedup_min_width // 2, axis=1,
    )
    fn, args, _ = eng.bench_step_fn(wide, top_k=9)
    keys_after_bench = set(eng._cache)
    eng.search(wide, top_k=9)
    assert set(eng._cache) == keys_after_bench
    # the benched step must be the deduped (weighted, narrow) config:
    # padded query operand is narrower than the raw batch
    assert args[1].shape[1] < wide.shape[1]


def test_sharded_sparse_search_pipelined_matches_search(setup):
    """Double-buffered sharded search: identical results to search()
    across batches, with weights, doc_mask, and ids_only."""
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

    idx, oracle = setup
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=make_mesh(4),
                                                hot_tokens=8)
    rng = np.random.default_rng(31)
    queries = rng.integers(-1, idx.vocab_size, size=(40, 6), dtype=np.int32)
    d1, s1 = eng.search(queries, top_k=9)
    d2, s2 = eng.search_pipelined(queries, top_k=9, batch=16)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    od, os_ = oracle.search(queries, top_k=9)
    np.testing.assert_allclose(s2, os_, rtol=1e-5, atol=1e-6)

    w = rng.uniform(0.5, 2.0, size=queries.shape).astype(np.float32)
    d1, s1 = eng.search(queries, top_k=9, weights=w)
    d2, s2 = eng.search_pipelined(queries, top_k=9, batch=16, weights=w)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)

    mask = rng.random(idx.num_docs) < 0.6
    d1, s1 = eng.search(queries, top_k=9, doc_mask=mask)
    d2, s2 = eng.search_pipelined(queries, top_k=9, batch=16, doc_mask=mask)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)

    ids = eng.search_pipelined(queries, top_k=9, batch=16, ids_only=True)
    np.testing.assert_array_equal(ids, eng.search_ids(queries, top_k=9))

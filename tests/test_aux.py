"""Auxiliary subsystems: snapshot round-trip, profiling helpers, shard plans."""

import numpy as np

from bm25_tpu.index.snapshot import load_snapshot, save_snapshot
from bm25_tpu.parallel.distributed import DocShardPlan
from bm25_tpu.runtime.profiling import StepTimer, op_span
from bm25_tpu.scoring import build_scored_index
from bm25_tpu.text.tokenizer import Tokenizer


def test_snapshot_round_trip(tmp_path, animal_corpus):
    tok = Tokenizer()
    out = tok.tokenize_corpus(animal_corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab), vocab=out.vocab)
    p = str(tmp_path / "snap.npz")
    save_snapshot(p, idx)
    loaded = load_snapshot(p)
    np.testing.assert_array_equal(loaded.data, idx.data)
    np.testing.assert_array_equal(loaded.indices, idx.indices)
    np.testing.assert_array_equal(loaded.indptr, idx.indptr)
    np.testing.assert_array_equal(loaded.doc_lengths, idx.doc_lengths)
    assert loaded.vocab == idx.vocab
    assert loaded.params == idx.params
    assert loaded.token_offsets is None  # all-zero offsets collapse to None


def test_step_timer_percentiles():
    t = StepTimer()
    for _ in range(10):
        with t.measure():
            pass
    s = t.summary()
    assert s["count"] == 10 and s["p50_ms"] >= 0


def test_op_span_composes_with_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        with op_span("bm25_score"):
            return x * 2

    assert float(f(jnp.float32(3.0))) == 6.0


def test_compile_phase_collector_captures_fresh_compile():
    """The warmup-breakdown collector must see the trace/lower/compile
    phases of a compilation that happens inside its with-block, and
    unregister cleanly after."""
    import jax
    import jax.numpy as jnp

    from bm25_tpu.runtime.profiling import compile_phase_collector

    def f(x):
        return (x * 2 + 1).sum()

    with compile_phase_collector() as phases:
        jax.block_until_ready(jax.jit(f)(jnp.arange(1024, dtype=jnp.float32)))
    # a fresh jit always traces + lowers; backend compile may be served
    # from the in-process cache only if an identical jaxpr compiled
    # before (it hasn't — f is local)
    assert phases["jaxpr_trace_s"] > 0
    assert phases["lower_to_mlir_s"] > 0
    assert phases["backend_compile_s"] > 0

    # after the block the listener is gone: durations stop accumulating
    snapshot = dict(phases)
    jax.block_until_ready(
        jax.jit(lambda x: x - 3)(jnp.arange(8, dtype=jnp.float32))
    )
    assert phases == snapshot


def test_doc_shard_plan_covers_all_docs():
    plan = DocShardPlan(num_docs=1000, num_hosts=3, num_devices_global=8)
    covered = []
    for h in range(3):
        lo, hi = plan.host_range(h)
        covered.extend(range(lo, hi))
    assert covered == list(range(1000))
    dev_cov = []
    for d in range(8):
        lo, hi = plan.device_range(d)
        dev_cov.extend(range(lo, hi))
    assert dev_cov == list(range(1000))


def test_matmul_bench_small():
    from bm25_tpu.bench.matmul_bench import bench_matmul

    res = bench_matmul(m=64, k=64, n=64, iters=2, log=lambda *a: None)
    assert {r["algorithm"] for r in res} == {"xla", "naive", "optimized"}
    assert all(r["gflops"] > 0 for r in res)


def test_health_probes():
    from bm25_tpu.runtime.health import device_probe, engine_probe
    from bm25_tpu.models.dense import DenseEngine
    from bm25_tpu.scoring import build_scored_index
    import numpy as np

    assert device_probe().ok

    rng = np.random.default_rng(0)
    ids = [rng.integers(0, 30, size=5).astype(np.int32) for _ in range(20)]
    eng = DenseEngine.from_scored_index(build_scored_index(ids, vocab_size=30))
    assert engine_probe(eng).ok

    class Broken:
        num_docs = 5

        def search(self, q, top_k):
            raise RuntimeError("device wedged")

    pr = engine_probe(Broken())
    assert not pr.ok and "device wedged" in pr.detail


def test_device_checkpoint_round_trip(tmp_path, zipf_corpus_small):
    from bm25_tpu.index.device_checkpoint import (
        restore_device_checkpoint, save_device_checkpoint)
    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    mesh = make_mesh(4)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh)
    q = np.array([[0, 1, 2]], dtype=np.int32)
    d0, s0 = eng.search(q, top_k=5)

    path = str(tmp_path / "ckpt")
    save_device_checkpoint(path, eng)

    # fresh engine (same mesh), arrays replaced by restored shards
    eng2 = ShardedSparseEngine.from_scored_index(idx, mesh=mesh)
    import jax.numpy as jnp
    for b in eng2.buckets:  # corrupt to prove restore works
        if "valT" in b:
            b["valT"] = jnp.zeros_like(b["valT"])
    restore_device_checkpoint(path, eng2)
    d1, s1 = eng2.search(q, top_k=5)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)


def test_distributed_initialize_noop_single_process(monkeypatch):
    from bm25_tpu.parallel import distributed

    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    distributed.initialize()  # single process: must be a silent no-op
    pid, count = distributed.process_info()
    assert pid == 0 and count == 1


def test_snapshot_round_trip_without_npz_extension(tmp_path, zipf_corpus_small):
    """save_snapshot('x') -> load_snapshot('x') must work even though numpy
    silently writes 'x.npz' (found by a live round-trip drive)."""
    import numpy as np

    from bm25_tpu.index.snapshot import load_snapshot, save_snapshot
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    out = Tokenizer(stopwords=None, stemmer=None).tokenize_corpus(
        zipf_corpus_small[:50]
    )
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    p = str(tmp_path / "snap")  # no extension
    save_snapshot(p, idx)
    idx2 = load_snapshot(p)
    np.testing.assert_array_equal(idx.indptr, idx2.indptr)
    np.testing.assert_array_equal(idx.indices, idx2.indices)
    np.testing.assert_allclose(idx.data, idx2.data)


def test_device_checkpoint_single_chip_engines(tmp_path, zipf_corpus_small):
    import numpy as np

    from bm25_tpu.index.device_checkpoint import (
        restore_device_checkpoint,
        save_device_checkpoint,
    )
    from bm25_tpu.models.dense import DenseEngine
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    out = Tokenizer(stopwords=None, stemmer=None).tokenize_corpus(
        zipf_corpus_small[:80]
    )
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    q = np.array([[0, 2, 5, -1]], dtype=np.int32)
    for i, cls in enumerate((SparseEngine, DenseEngine)):
        e1 = cls.from_scored_index(idx)
        d1, s1 = e1.search(q, top_k=4)
        save_device_checkpoint(tmp_path / f"ck{i}", e1)
        e2 = cls.from_scored_index(idx)
        restore_device_checkpoint(tmp_path / f"ck{i}", e2)
        d2, s2 = e2.search(q, top_k=4)
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(s1, s2)


def test_device_checkpoint_rejects_unknown_engine(tmp_path):
    import pytest as _pytest

    from bm25_tpu.index.device_checkpoint import save_device_checkpoint

    class Odd:
        pass

    with _pytest.raises(TypeError, match="snapshot.py"):
        save_device_checkpoint(tmp_path / "x", Odd())


def test_device_checkpoint_metadata_only_restore(tmp_path, zipf_corpus_small):
    """Warm restart: load_device_checkpoint reconstructs a serving engine
    without EVER calling from_scored_index (VERDICT r1 item 5)."""
    from bm25_tpu.index.device_checkpoint import (
        load_device_checkpoint, save_device_checkpoint)
    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab), vocab=out.vocab)
    mesh = make_mesh(4)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh, hot_tokens=8)
    assert eng.hot_h > 0  # the checkpoint must carry real hot state
    q = np.array([[0, 1, 2], [5, -1, -1]], dtype=np.int32)
    d0, s0 = eng.search(q, top_k=5)
    path = str(tmp_path / "ckpt_meta")
    save_device_checkpoint(path, eng)

    eng2 = load_device_checkpoint(path, mesh=mesh)
    assert type(eng2).__name__ == "ShardedSparseEngine"
    assert eng2.hot_h == eng.hot_h
    assert eng2.vocab == eng.vocab
    d1, s1 = eng2.search(q, top_k=5)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)


def test_device_checkpoint_covers_sharded_hot_state(tmp_path, zipf_corpus_small):
    """hotT/hotLo/hot_table must round-trip for ShardedSparseEngine
    (ADVICE r1 medium: they were silently dropped)."""
    import jax.numpy as jnp

    from bm25_tpu.index.device_checkpoint import (
        restore_device_checkpoint, save_device_checkpoint)
    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    out = Tokenizer(stopwords=None, stemmer=None).tokenize_corpus(
        zipf_corpus_small
    )
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    mesh = make_mesh(4)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh, hot_tokens=8)
    assert eng.hot_h > 0
    q = np.array([[0, 1, 2]], dtype=np.int32)
    d0, s0 = eng.search(q, top_k=5)
    path = str(tmp_path / "ckpt_hot")
    save_device_checkpoint(path, eng)

    eng2 = ShardedSparseEngine.from_scored_index(idx, mesh=mesh, hot_tokens=8)
    for b in eng2.buckets:  # corrupt the hot state
        b["hotT"] = jnp.zeros_like(b["hotT"])
        b["hotLo"] = jnp.zeros_like(b["hotLo"])
    restore_device_checkpoint(path, eng2)
    d1, s1 = eng2.search(q, top_k=5)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)


def test_device_checkpoint_metadata_only_single_chip(tmp_path, zipf_corpus_small):
    from bm25_tpu.index.device_checkpoint import (
        load_device_checkpoint, save_device_checkpoint)
    from bm25_tpu.models.dense import DenseEngine
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    out = Tokenizer(stopwords=None, stemmer=None).tokenize_corpus(
        zipf_corpus_small[:80]
    )
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    q = np.array([[0, 2, 5, -1]], dtype=np.int32)
    for i, cls in enumerate((SparseEngine, DenseEngine)):
        e1 = cls.from_scored_index(idx)
        d1, s1 = e1.search(q, top_k=4)
        save_device_checkpoint(tmp_path / f"meta_ck{i}", e1)
        e2 = load_device_checkpoint(tmp_path / f"meta_ck{i}")
        assert type(e2) is cls
        d2, s2 = e2.search(q, top_k=4)
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(s1, s2)


def test_memory_stats_counts_all_device_arrays(zipf_corpus_small):
    """hotLo + sharded engines were missing from the accounting (VERDICT r1)."""
    from bm25_tpu.eval import index_memory_stats
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    out = Tokenizer(stopwords=None, stemmer=None).tokenize_corpus(
        zipf_corpus_small
    )
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    eng = SparseEngine.from_scored_index(idx, hot_tokens=8)
    assert eng.hot_h > 0
    stats = index_memory_stats(idx, eng)
    hot_bytes = sum(
        int(np.prod(b["hotT"].shape)) * b["hotT"].dtype.itemsize
        + int(np.prod(b["hotLo"].shape)) * b["hotLo"].dtype.itemsize
        for b in eng.buckets
    )
    assert hot_bytes > 0
    # strictly larger than an accounting that ignores hotLo
    no_hotlo = stats.device_bytes - sum(
        int(np.prod(b["hotLo"].shape)) * b["hotLo"].dtype.itemsize
        for b in eng.buckets
    )
    assert stats.device_bytes > no_hotlo

    sh = ShardedSparseEngine.from_scored_index(
        idx, mesh=make_mesh(4), hot_tokens=8
    )
    sh_stats = index_memory_stats(idx, sh)
    assert sh_stats.device_bytes > 0  # was 0 in round 1


def test_restore_device_checkpoint_without_meta_sidecar(tmp_path,
                                                       zipf_corpus_small):
    """Pre-sidecar checkpoints (no .meta.json) still restore into a live
    engine — targets derive from the engine's arrays (original behavior)."""
    import os

    from bm25_tpu.index.device_checkpoint import (
        restore_device_checkpoint, save_device_checkpoint)
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    eng = SparseEngine.from_scored_index(idx, hot_tokens=8)
    q = np.array([[0, 1, 2]], dtype=np.int32)
    d0, s0 = eng.search(q, top_k=5)
    path = str(tmp_path / "ckpt")
    # a REAL pre-sidecar checkpoint stored the DENSE tree (v4 saves the
    # compact hot form) — write one the way v1 did
    import orbax.checkpoint as ocp

    from bm25_tpu.index.device_checkpoint import _engine_state

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _engine_state(eng, compact=False))
    assert not os.path.exists(path + ".meta.json")

    import jax.numpy as jnp
    eng2 = SparseEngine.from_scored_index(idx, hot_tokens=8)
    for b in eng2.buckets:
        if "valT" in b:
            b["valT"] = jnp.zeros_like(b["valT"])
    restore_device_checkpoint(path, eng2)
    d1, s1 = eng2.search(q, top_k=5)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)


def test_device_checkpoint_restores_routing_host_table(
    tmp_path, zipf_corpus_small
):
    """ADVICE r2: restore paths must refresh hot_table_host so cold-width
    routing agrees with the restored device table (sharded load path) and
    with a restored-in-place table whose hot assignment differs."""
    from bm25_tpu.index.device_checkpoint import (
        load_device_checkpoint, restore_device_checkpoint,
        save_device_checkpoint)
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab),
                             vocab=out.vocab)

    # 1) sharded metadata-only load: host routing table must be populated
    mesh = make_mesh(4)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh, hot_tokens=8)
    assert eng.hot_h > 0
    path = str(tmp_path / "ckpt_route")
    save_device_checkpoint(path, eng)
    eng2 = load_device_checkpoint(path, mesh=mesh)
    assert eng2.hot_table_host is not None
    np.testing.assert_array_equal(
        eng2.hot_table_host, np.asarray(eng2.hot_table)
    )

    # 2) in-place restore with a DIFFERENT hot assignment (same shapes):
    # the host copy must track the restored device table, not the stale one
    e_a = SparseEngine.from_scored_index(idx, hot_tokens=4)
    e_b = SparseEngine.from_scored_index(idx, hot_tokens=4)
    tbl = np.asarray(e_a.hot_table).copy()
    hot_ids = np.flatnonzero(tbl >= 0)
    # rotate which tokens are hot (keep count identical => same shapes)
    rolled = np.full_like(tbl, -1)
    rolled[(hot_ids + 1) % (len(tbl) - 1)] = tbl[hot_ids]
    e_a.hot_table = e_a.session.put(rolled)
    e_a.hot_table_host = rolled
    p2 = str(tmp_path / "ckpt_rolled")
    save_device_checkpoint(p2, e_a)
    restore_device_checkpoint(p2, e_b)
    np.testing.assert_array_equal(e_b.hot_table_host, rolled)


def test_device_checkpoint_v4_sparse_hot(tmp_path, zipf_corpus_small):
    """v4 stores the hot tier sparse (much smaller) and the restored dense
    bf16 pair is BIT-identical; v3 dense checkpoints still load."""
    import json as _json

    import orbax.checkpoint as ocp

    from bm25_tpu.index.device_checkpoint import (
        _engine_meta, _engine_state, load_device_checkpoint,
        save_device_checkpoint)
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab),
                             vocab=out.vocab)
    eng = SparseEngine.from_scored_index(idx, hot_tokens=16)
    assert eng.hot_h == 16
    p4 = str(tmp_path / "v4")
    save_device_checkpoint(p4, eng)
    # the saved tree is sparse: no dense hotT leaves on disk
    meta = _json.load(open(p4 + ".meta.json"))
    assert meta["version"] == 4
    flat = _json.dumps(meta["tree"])
    assert "hotNzRank" in flat and '"hotT"' not in flat

    e2 = load_device_checkpoint(p4)
    for b_old, b_new in zip(eng.buckets, e2.buckets):
        if "hotT" in b_old:
            np.testing.assert_array_equal(
                np.asarray(b_old["hotT"]), np.asarray(b_new["hotT"])
            )
            np.testing.assert_array_equal(
                np.asarray(b_old["hotLo"]), np.asarray(b_new["hotLo"])
            )
    q = np.array([[0, 1, 5, -1]], dtype=np.int32)
    np.testing.assert_array_equal(eng.search(q, top_k=6)[0],
                                  e2.search(q, top_k=6)[0])

    # v3 (dense) checkpoint still loads through the same path
    p3 = str(tmp_path / "v3")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(p3, _engine_state(eng, compact=False))
    m3 = _engine_meta(eng)
    m3["version"] = 3
    import jax

    m3["tree"] = jax.tree.map(
        lambda x: [list(x.shape), str(x.dtype)],
        _engine_state(eng, compact=False),
    )
    with open(p3 + ".meta.json", "w") as f:
        _json.dump(m3, f)
    e3 = load_device_checkpoint(p3)
    np.testing.assert_array_equal(eng.search(q, top_k=6)[0],
                                  e3.search(q, top_k=6)[0])


def test_device_checkpoint_restore_validates_engine_and_corpus(
        tmp_path, zipf_corpus_small):
    """restore_device_checkpoint refuses a wrong-engine or wrong-corpus
    checkpoint up front: a mismatch whose array shapes happen to line up
    would otherwise setattr cleanly and serve wrong results silently."""
    import pytest

    from bm25_tpu.index.device_checkpoint import (
        restore_device_checkpoint, save_device_checkpoint)
    from bm25_tpu.models.dense import DenseEngine
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    eng = SparseEngine.from_scored_index(idx)
    path = str(tmp_path / "ckpt_v")
    save_device_checkpoint(path, eng)

    # wrong engine type
    dense = DenseEngine.from_scored_index(idx)
    with pytest.raises(ValueError, match="SparseEngine"):
        restore_device_checkpoint(path, dense)

    # wrong corpus size (same engine type)
    idx2 = build_scored_index(out.ids[:-1], vocab_size=len(out.vocab))
    eng2 = SparseEngine.from_scored_index(idx2)
    with pytest.raises(ValueError, match="num_docs"):
        restore_device_checkpoint(path, eng2)


def test_device_checkpoint_load_validates_mesh(tmp_path, zipf_corpus_small):
    """A sharded checkpoint records its mesh topology; loading onto a mesh
    with a different doc-axis size fails with a message instead of dying
    inside the Pallas kernel at the first query."""
    import pytest

    from bm25_tpu.index.device_checkpoint import (
        load_device_checkpoint, save_device_checkpoint)
    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(zipf_corpus_small)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=make_mesh(4))
    path = str(tmp_path / "ckpt_mesh")
    save_device_checkpoint(path, eng)

    with pytest.raises(ValueError, match="doc shards"):
        load_device_checkpoint(path, mesh=make_mesh(2))

    # matching mesh still loads and answers identically
    q = np.array([[0, 1, 2]], dtype=np.int32)
    d0, s0 = eng.search(q, top_k=5)
    eng2 = load_device_checkpoint(path, mesh=make_mesh(4))
    d1, s1 = eng2.search(q, top_k=5)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)


def test_explicit_compile_cache_path_overrides_default(tmp_path):
    """An explicit enable_persistent_compile_cache(path) wins even after a
    default (implicit) configuration already latched (regression: the
    deliberate override was silently dropped)."""
    import jax

    from bm25_tpu.runtime import session as S

    before = jax.config.jax_compilation_cache_dir
    try:
        S.enable_persistent_compile_cache()  # implicit default
        target = str(tmp_path / "cc")
        S.enable_persistent_compile_cache(target)
        assert jax.config.jax_compilation_cache_dir == target
    finally:
        jax.config.update("jax_compilation_cache_dir", before)

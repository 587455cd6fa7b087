"""Engine auto-selection (models/auto.py) + synthetic bench data sanity."""

import numpy as np
import pytest

from bm25_tpu.bench.query_bench import BenchConfig, make_queries, make_synthetic_index
from bm25_tpu.models.auto import create_engine
from bm25_tpu.models.dense import DenseEngine
from bm25_tpu.models.sparse import SparseEngine
from bm25_tpu.scoring import build_scored_index
from bm25_tpu.text.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def idx(request):
    corpus = request.getfixturevalue("zipf_corpus_small")
    out = Tokenizer(stopwords=None, stemmer=None).tokenize_corpus(corpus)
    return build_scored_index(out.ids, vocab_size=len(out.vocab))


def test_auto_picks_dense_when_score_matrix_fits(idx):
    eng = create_engine(idx, mode="auto")
    assert isinstance(eng, DenseEngine)


def test_auto_falls_back_to_sparse_over_budget(idx):
    eng = create_engine(idx, mode="auto", dense_budget_bytes=1024)
    assert isinstance(eng, SparseEngine)


@pytest.mark.parametrize("mode,cls", [("dense", DenseEngine), ("sparse", SparseEngine)])
def test_explicit_modes(idx, mode, cls):
    assert isinstance(create_engine(idx, mode=mode), cls)


def test_explicit_mode_results_agree(idx):
    q = np.array([[0, 2, 5, -1]], dtype=np.int32)
    d_docs, d_scores = create_engine(idx, mode="dense").search(q, top_k=5)
    s_docs, s_scores = create_engine(idx, mode="sparse").search(q, top_k=5)
    np.testing.assert_allclose(d_scores, s_scores, rtol=1e-5)
    assert set(d_docs[0].tolist()) == set(s_docs[0].tolist())


def test_unknown_mode_raises(idx):
    with pytest.raises(ValueError, match="unknown engine mode"):
        create_engine(idx, mode="gpu")


def test_sharded_modes_dispatch(idx):
    from bm25_tpu.parallel.sharded_engine import ShardedEngine, ShardedSparseEngine

    assert isinstance(create_engine(idx, mode="sharded"), ShardedEngine)
    assert isinstance(create_engine(idx, mode="sharded_sparse"), ShardedSparseEngine)


def test_synthetic_index_deterministic_and_env_override(monkeypatch):
    cfg = BenchConfig(num_docs=64, vocab=128, num_queries=8, avg_len=12)
    a, b = make_synthetic_index(cfg), make_synthetic_index(cfg)
    assert a.num_docs == 64 and a.vocab_size == 128
    np.testing.assert_array_equal(a.indptr, b.indptr)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.data, b.data)
    q = make_queries(cfg)
    assert q.shape == (8, cfg.query_len) and q.dtype == np.int32
    assert q.min() >= 0 and q.max() < 128
    monkeypatch.setenv("BM25_BENCH_NUM_DOCS", "99")
    monkeypatch.setenv("BM25_BENCH_ENGINE", "sparse")
    env_cfg = BenchConfig.from_env()
    assert env_cfg.num_docs == 99 and env_cfg.engine == "sparse"


def test_explicit_mode_rejects_unknown_kwargs():
    """Explicit modes must raise on unsupported options (auto may filter)."""
    import pytest as _pytest

    from bm25_tpu.models.auto import create_engine
    from bm25_tpu.scoring import build_scored_index

    rng = np.random.default_rng(0)
    ids = [rng.integers(0, 16, size=5).astype(np.int32) for _ in range(10)]
    idx = build_scored_index(ids, vocab_size=16)
    with _pytest.raises(TypeError):
        create_engine(idx, mode="dense", score_dtype="bfloat16")
    # auto filters: a sparse-only option with a dense auto-pick is dropped
    eng = create_engine(idx, mode="auto", score_dtype="bfloat16")
    assert type(eng).__name__ == "DenseEngine"
    with _pytest.raises(ValueError, match="score_dtype"):
        create_engine(idx, mode="sparse", score_dtype="float16")


def test_auto_respects_user_max_bytes(idx):
    """A user max_bytes caps the DECISION too: auto must fall back to
    sparse instead of picking dense and crashing on its MemoryError."""
    from bm25_tpu.models.sparse import SparseEngine

    eng = create_engine(idx, mode="auto", max_bytes=1024)
    assert isinstance(eng, SparseEngine)


def test_auto_sizes_by_requested_dtype(idx):
    """bf16 halves the dense footprint; the auto estimate must use the
    forwarded dtype's itemsize, not hardcode 4 bytes."""
    import jax.numpy as jnp

    from bm25_tpu.models.dense import DenseEngine
    from bm25_tpu.ops.gather_rows import doc_pad
    from bm25_tpu.utils.padding import next_multiple

    v = next_multiple(idx.vocab_size + 1, 8)
    d = doc_pad(idx.num_docs)
    budget = v * d * 3  # fits bf16 (2 B/elt), not f32 (4 B/elt)
    dense = create_engine(idx, mode="auto", dense_budget_bytes=budget,
                          dtype=jnp.bfloat16, max_bytes=budget)
    assert isinstance(dense, DenseEngine)
    from bm25_tpu.models.sparse import SparseEngine

    sparse = create_engine(idx, mode="auto", dense_budget_bytes=budget,
                           max_bytes=budget)  # f32 default: over budget
    assert isinstance(sparse, SparseEngine)

"""Compile-cache warmer: plan enumeration, shape targeting, CLI surface."""

import json

import numpy as np
import pytest

from bm25_tpu.cli.main import main
from bm25_tpu.models.sparse import SparseEngine
from bm25_tpu.runtime.warmup import _query_matrix, default_plan, warm_engine
from bm25_tpu.scoring import build_scored_index
from bm25_tpu.text.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def engine(request):
    corpus = request.getfixturevalue("zipf_corpus_small")
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))
    # a real hot tier (routing defaults to "auto" at >= 32-row batches)
    return SparseEngine.from_scored_index(idx, hot_tokens=16)


def test_default_plan_covers_unrouted_and_routed(engine):
    tasks = default_plan(engine, top_ks=(5, 10), batch_sizes=(1, 8),
                         routed_batch=64, cold_classes=(2, 4))
    # per top_k: 2 unrouted batches + 2 routed heights x 2 cold classes —
    # the dispatch DP cuts mixed-cold batches into pow2 chunk heights
    # (32..batch), so every (height, class) pair is its own compile
    assert len(tasks) == 2 * (2 + 2 * 2)
    routed = [t for t in tasks if t["cold"] is not None]
    assert {t["q"] for t in routed} == {32, 64}
    assert {t["cold"] for t in routed} == {2, 4}
    assert {t["top_k"] for t in tasks} == {5, 10}


def test_default_plan_warms_every_batch_size(engine):
    """A size at/above the routing floor warms ROUTED (per cold class),
    never silently dropped (review finding: q=32 vanished from the plan)."""
    tasks = default_plan(engine, top_ks=(5,), batch_sizes=(1, 8, 32),
                         routed_batch=512, cold_classes=(2, 4))
    assert engine.route_min_queries == 32
    by_q = {}
    for t in tasks:
        by_q.setdefault(t["q"], []).append(t["cold"])
    assert by_q[1] == [None] and by_q[8] == [None]
    assert sorted(by_q[32]) == [2, 4]      # routed, both classes
    assert sorted(by_q[512]) == [2, 4]


def test_default_plan_variant_families(engine):
    tasks = default_plan(engine, top_ks=(5,), batch_sizes=(8,),
                         routed_batch=64, cold_classes=(2,),
                         weighted=True, ids_only=True)
    plain = [t for t in tasks if not t["weighted"] and not t["ids_only"]]
    weighted = [t for t in tasks if t["weighted"]]
    ids_only = [t for t in tasks if t["ids_only"]]
    # 1 unrouted size + 2 routed heights (32, 64) x 1 class, per variant
    assert len(plain) == len(weighted) == len(ids_only) == 3


def test_default_plan_without_routing():
    class Bare:
        vocab_size = 100
        hot_table_host = None
        hot_h = 0

    tasks = default_plan(Bare(), top_ks=(10,), batch_sizes=(8,),
                         routed_batch=64)
    # no routed family; the big batch still warms as an unrouted shape
    assert [t["cold"] for t in tasks] == [None, None]
    assert {t["q"] for t in tasks} == {8, 64}


def test_query_matrix_pins_cold_counts(engine):
    rng = np.random.default_rng(0)
    ids = _query_matrix(engine, 16, 8, 3, rng)
    assert ids.shape == (16, 8) and ids.dtype == np.int32
    table = engine.hot_table_host
    cold_counts = (table[ids] < 0).sum(axis=1)
    np.testing.assert_array_equal(cold_counts, np.full(16, 3))
    assert ids.min() >= 0 and ids.max() < engine.vocab_size


def test_warm_engine_runs_and_reports(engine):
    report = warm_engine(
        engine, top_ks=(5,), batch_sizes=(1,), routed_batch=32,
        cold_classes=(2,), weighted=True, ids_only=True,
    )
    assert all("seconds" in r and r["seconds"] >= 0 for r in report)
    kinds = {(r["weighted"], r["ids_only"]) for r in report}
    assert kinds == {(False, False), (True, False), (False, True)}
    # warming must not disturb the engine: a real search still works
    docs, scores = engine.search(
        np.array([[1, 2, 3, -1]], dtype=np.int32), top_k=3
    )
    assert docs.shape == (1, 3)


def test_warm_cli(tmp_path, animal_corpus, capsys):
    corpus_file = tmp_path / "docs.txt"
    corpus_file.write_text("\n".join(animal_corpus))
    out = tmp_path / "idx"
    assert main(["index", str(corpus_file), "-o", str(out)]) == 0
    capsys.readouterr()
    assert main(["warm", str(out), "--top-k", "3", "--batch-sizes", "1,8",
                 "--routed-batch", "32", "--weighted"]) == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["shapes"] == len(payload["report"]) > 0
    assert all(r["seconds"] >= 0 for r in payload["report"])


def test_warm_cli_requires_source(capsys):
    assert main(["warm"]) == 2


def test_default_plan_clamps_wide_cold_classes(engine):
    """Classes wider than the query width clamp to it instead of dropping
    the routed family entirely (review finding: widths=(1,) warmed
    nothing at routed sizes)."""
    tasks = default_plan(engine, top_ks=(5,), batch_sizes=(8,),
                         routed_batch=64, widths=(1,),
                         cold_classes=(2, 4, 8))
    routed = [t for t in tasks if t["cold"] is not None]
    assert routed, "routed family must not vanish for narrow widths"
    assert {t["cold"] for t in routed} == {1}


def test_default_plan_respects_route_min_zero(engine):
    """route_min_queries=0 means 'route always' — the plan must not remap
    it to the default 32 and warm small batches unrouted."""
    old = engine.route_min_queries
    engine.route_min_queries = 0
    try:
        tasks = default_plan(engine, top_ks=(5,), batch_sizes=(8,),
                             routed_batch=64, cold_classes=(2,))
        assert all(t["cold"] is not None for t in tasks)
    finally:
        engine.route_min_queries = old


def test_warm_engine_tolerates_minimal_task_dicts(engine):
    """default_plan invites plan editing; a hand-built task with only the
    core keys must run, not KeyError."""
    report = warm_engine(engine, tasks=[{"q": 4, "t": 8, "top_k": 3}])
    assert report[0]["seconds"] >= 0

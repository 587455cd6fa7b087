"""End-to-end smoke of the driver bench pipeline (bench.py -> run()).

The driver runs ``bench.py`` on real hardware every round; this pins the
result schema at a tiny shape on the CPU mesh so a refactor cannot break
the driver's JSON contract, and covers the memory-parity row (the
BASELINE.md "index memory equal to reference CSC footprint" target).
"""

import json

import numpy as np

from bm25_tpu.bench.query_bench import BenchConfig, compact_headline, run


def test_run_schema_and_memory_parity():
    cfg = BenchConfig(
        num_docs=256, vocab=512, avg_len=16, num_queries=64, batch=32,
        top_k=20, top_k2=5, baseline_queries=8, engine="sparse",
        max_buckets=2, eval_docs=200, eval_queries=8,
        longdoc_docs=96, longdoc_long_len=320, longdoc_short_len=16,
        sharded_docs=128,
    )
    res = run(cfg, log=lambda *a: None)

    assert res["metric"] == "bm25_query_throughput"
    assert res["unit"] == "queries/sec"
    assert res["value"] > 0 and res["vs_baseline"] > 0
    extra = res["extra"]
    head = extra["headline"]
    assert head["top_k"] == 20
    assert head["recall_vs_reference"] == 1.0
    assert [r["top_k"] for r in extra["secondary"]] == [5]
    assert extra["secondary"][0]["recall_vs_reference"] == 1.0
    assert extra["upload_init_s"] >= 0
    assert extra["index_memory"]["csc_bytes"] > 0
    for mode in ("dense", "sparse"):
        ev = extra["beir_synthetic_eval"][mode]
        assert 0 < ev["recall@10"] <= 1.0 and 0 <= ev["ndcg@10"] <= 1.0

    # memory-parity row: hot-tier-free engine, exact, near-CSC footprint
    mp = extra["memory_parity"]
    assert mp["top_k"] == 20
    assert mp["recall_vs_reference"] == 1.0
    ratio = mp["index_memory"]["overhead_ratio"]
    # ELL padding at tiny shapes is relatively worse than at scale; the
    # bound just pins "no hot tier" (the default engine here carries one)
    assert ratio < extra["index_memory"]["overhead_ratio"] or ratio <= 2.0

    # long-document row: schema + exactness (slot_tiled only engages when
    # a bucket exceeds SLOT_TILE — not guaranteed at this tiny shape; the
    # kernel-level tests pin the tiled path itself)
    ld = extra["longdoc"]
    assert ld["top_k"] == 20 and ld["num_docs"] == 96
    assert ld["recall_vs_reference"] == 1.0
    # at tiny shapes the auto hot tier can absorb every posting, leaving
    # zero ELL buckets — widths just has to be reported
    assert ld["nnz"] > 0 and isinstance(ld["bucket_widths"], list)
    assert isinstance(ld["slot_tiled"], bool)

    # sharded row: ShardedSparseEngine over the local mesh, exact
    sh = extra["sharded"]
    assert sh["top_k"] == 20 and sh["num_docs"] == 128
    assert sh["recall_vs_reference"] == 1.0
    assert isinstance(sh["mesh"], dict) and sh["mesh"]

    # the compact headline line (the driver's tail-capture record) stays
    # whole and small: VERDICT r4 item 1 pins < 1000 bytes
    compact = compact_headline(res)
    assert compact["metric"] == "bm25_query_throughput"
    assert compact["value"] == res["value"]
    assert compact["recall"] == 1.0
    assert compact["upload_init_s"] == extra["upload_init_s"]
    assert len(json.dumps(compact)) < 1000


def test_shard_scaling_row_skipped_at_test_shapes():
    """The shard-scaling subprocess row only engages at driver scale
    (num_docs >= 100k) — tiny test configs must not pay minutes of CPU
    mesh compiles."""
    cfg = BenchConfig(
        num_docs=128, vocab=256, avg_len=12, num_queries=32, batch=16,
        top_k=10, top_k2=10, baseline_queries=4, engine="sparse",
        max_buckets=1, memory_parity=0, eval_docs=120, eval_queries=4,
        longdoc_docs=0, sharded_docs=0, cold_start=0, shard_scaling=1,
    )
    res = run(cfg, log=lambda *a: None)
    assert "shard_scaling" not in res["extra"]


def test_measure_shard_scaling_handles_subprocess_failure(monkeypatch):
    """A broken scaling subprocess yields an error row, never an
    exception out of the bench."""
    import subprocess

    from bm25_tpu.bench import query_bench

    def boom(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="x", timeout=1)

    monkeypatch.setattr(subprocess, "run", boom)
    cfg = BenchConfig(shard_scaling=2, shard_scaling_docs=64, top_k=5)
    out = query_bench._measure_shard_scaling(cfg, log=lambda *a: None)
    assert "error" in out


def test_compact_headline_worst_case_size_and_missing_fields():
    """Size pin with realistic-width fields + graceful handling of a
    degenerate result (no extra at all)."""
    fat = {
        "metric": "bm25_query_throughput",
        "value": 123456.789,
        "unit": "queries/sec",
        "vs_baseline": 12345.678,
        "extra": {
            "headline": {"top_k": 100000, "device_step_ms": 123456.78,
                         "recall_vs_reference": 0.9999,
                         "qps": 9999999.99},
            "secondary": [{"top_k": 100000, "qps": 9999999.99,
                           "device_step_ms": 123456.78}] * 2,
            "upload_init_s": 9999.9,
            "index_build_docs_per_sec": 99999999.9,
            "warning": "upload_init_s 9999.9 exceeds warm budget 14s "
                       "(expected 6.6-13s warm; see NOTES r4)",
        },
    }
    line = json.dumps(compact_headline(fat))
    assert len(line) < 1000
    assert json.loads(line)["warning"].startswith("upload_init_s")

    empty = compact_headline({"metric": "m", "value": 1, "unit": "u",
                              "vs_baseline": 2})
    assert empty["device_step_ms"] is None
    assert len(json.dumps(empty)) < 1000


def test_memory_parity_opt_out():
    cfg = BenchConfig(
        num_docs=128, vocab=256, avg_len=12, num_queries=32, batch=16,
        top_k=10, top_k2=10, baseline_queries=4, engine="sparse",
        max_buckets=1, memory_parity=0, eval_docs=120, eval_queries=4,
        longdoc_docs=0,
    )
    res = run(cfg, log=lambda *a: None)
    assert "memory_parity" not in res["extra"]
    assert "longdoc" not in res["extra"]
    assert res["extra"]["headline"]["recall_vs_reference"] == 1.0


def test_longdoc_row_with_dense_headline_engine():
    """The longdoc row frees the headline engine via the non-parity path
    (engine='dense' skips the memory-parity block) and still reports."""
    cfg = BenchConfig(
        num_docs=128, vocab=256, avg_len=12, num_queries=32, batch=16,
        top_k=10, top_k2=10, baseline_queries=4, engine="dense",
        memory_parity=1, eval_docs=120, eval_queries=4,
        longdoc_docs=64, longdoc_long_len=200, longdoc_short_len=12,
    )
    res = run(cfg, log=lambda *a: None)
    assert "memory_parity" not in res["extra"]  # dense headline: no row
    ld = res["extra"]["longdoc"]
    assert ld["recall_vs_reference"] == 1.0 and ld["num_docs"] == 64


def test_memory_trade_curve_rows():
    """The bench reports a three-point memory/speed curve (VERDICT r3
    item 4): parity floor, overhead_target=3.0 mid point, and the
    speed-optimal headline — each exact and with its measured footprint."""
    cfg = BenchConfig(
        num_docs=256, vocab=512, avg_len=16, num_queries=64, batch=32,
        top_k=20, top_k2=5, baseline_queries=8, engine="sparse",
        max_buckets=2, eval_docs=200, eval_queries=8,
        longdoc_docs=0, sharded_docs=0,
    )
    res = run(cfg, log=lambda *a: None)
    trade = res["extra"]["memory_trade"]
    assert [r["point"] for r in trade] == ["parity", "mid", "speed"]
    for r in trade:
        assert r["recall_vs_reference"] == 1.0
        assert r["index_memory"]["overhead_ratio"] > 0
    parity, mid, speed = trade
    assert parity["hot_h"] == 0
    # mid honors the knob within 10% — or degrades to the ELL-only floor
    # when row padding alone exceeds the target (tiny corpora pad 256
    # docs to 512 kernel rows; the floor itself can sit above 3x there)
    floor = parity["index_memory"]["overhead_ratio"]
    assert mid["index_memory"]["overhead_ratio"] <= max(3.0 * 1.1, floor)
    # the curve spends monotonically more memory toward speed
    assert (parity["index_memory"]["device_bytes"]
            <= mid["index_memory"]["device_bytes"]
            <= speed["index_memory"]["device_bytes"])


def test_cold_start_row(tmp_path):
    """cold_start reports the cold-compile and cache-import costs of one
    headline chunk shape (VERDICT r3 item 5) and restores the persistent
    cache config afterwards."""
    import jax

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "cc"))
    try:
        cfg = BenchConfig(
            num_docs=256, vocab=512, avg_len=16, num_queries=64, batch=32,
            top_k=20, top_k2=5, baseline_queries=8, engine="sparse",
            max_buckets=2, eval_docs=200, eval_queries=8,
            longdoc_docs=0, sharded_docs=0, memory_parity=0, cold_start=1,
        )
        res = run(cfg, log=lambda *a: None)
        cold = res["extra"]["cold_start"]
        assert cold["headline_step_cold_compile_s"] >= 0
        assert cold["upload_init_warm_s"] >= 0
        # CPU compiles are sub-second, so the persistent store may hold
        # nothing to export; either the import figure or the recorded
        # error must be present — silence would mean the path never ran
        assert ("headline_step_cache_import_s" in cold
                or "cache_import_error" in cold)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)

"""Real-data readiness (VERDICT r3 item 6): the checked-in mini BEIR
fixture pins the exact on-disk formats an MS MARCO/BEIR drop will use,
and `bm25-tpu eval --run-file` is the tested one-command path.

Fixture: tests/data/mini_beir (scripts/make_mini_beir_fixture.py) —
320 docs / 16 queries / 128 graded judgments, BEIR 3-col qrels (test
split) AND TREC 4-col qrels (dev split) over the same judgments.
"""

import json
import os

import numpy as np
import pytest

from bm25_tpu.cli.main import main
from bm25_tpu.datasets import load_beir

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "mini_beir")


def test_fixture_loads_format_exact():
    ds = load_beir(FIXTURE)  # test split: BEIR 3-col with header
    assert ds.num_docs == 320 and len(ds.query_ids) == 16
    assert sum(len(r) for r in ds.qrels.values()) == 128
    # graded judgments (nDCG needs >1 grade present)
    grades = {g for r in ds.qrels.values() for g in r.values()}
    assert grades == {1, 2}
    # the dev split carries the SAME judgments in TREC 4-col layout —
    # both qrels parsers must agree or an MS MARCO drop would silently
    # score against half-parsed judgments
    dev = load_beir(FIXTURE, split="dev")
    assert dev.qrels == ds.qrels


def test_eval_cli_one_command_path(tmp_path, capsys):
    run_file = tmp_path / "run.trec"
    assert main(["eval", FIXTURE, "-k", "10",
                 "--engine", "sparse", "--run-file", str(run_file)]) == 0
    out = capsys.readouterr().out
    res = json.loads(out[out.index("{"):])
    # topic structure (easy phrase queries + hard vocab-overlap queries)
    # keeps every metric strictly inside (0, 1): a ranking regression
    # MOVES them (a saturated fixture could not discriminate).  Exact
    # values with the current scorer: recall 0.6953, mrr 0.6231,
    # ndcg 0.6572 — the bands below allow small tokenizer-level drift
    # while still catching ranking changes.
    assert res["num_queries"] == 16
    assert 0.55 <= res["recall@10"] <= 0.85, res
    assert 0.45 <= res["mrr@10"] <= 0.8, res
    assert 0.5 <= res["ndcg@10"] <= 0.8, res

    # TREC run format: qid Q0 docid rank score tag — consumable by
    # trec_eval / pytrec_eval / ir_measures
    lines = run_file.read_text().strip().splitlines()
    assert len(lines) == 16 * 10
    parts = lines[0].split()
    assert len(parts) == 6 and parts[1] == "Q0" and parts[5] == "bm25-tpu"
    assert parts[0].startswith("q") and parts[2].startswith("d")
    ranks = [int(ln.split()[3]) for ln in lines[:10]]
    assert ranks == list(range(1, 11))
    scores = [float(ln.split()[4]) for ln in lines[:10]]
    assert scores == sorted(scores, reverse=True)


def test_eval_dense_sparse_agree_on_fixture(capsys):
    """Engine families must produce identical metrics on real-format data
    (exact math; a divergence = ranking bug, not quality difference)."""
    results = {}
    for engine in ("dense", "sparse"):
        assert main(["eval", FIXTURE, "-k", "10", "--engine", engine]) == 0
        out = capsys.readouterr().out
        res = json.loads(out[out.index("{"):])
        results[engine] = (res["recall@10"], res["mrr@10"], res["ndcg@10"])
    assert results["dense"] == results["sparse"]


def test_fixture_regenerates_byte_identical(tmp_path):
    """The generator is deterministic: a drop-format change can never
    sneak in without an explicit fixture regeneration in the diff."""
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), os.pardir,
                          "scripts", "make_mini_beir_fixture.py")
    if not os.path.exists(script):
        pytest.skip("generator script not shipped")
    out = tmp_path / "regen"
    subprocess.run(
        [sys.executable, script], check=True,
        cwd=tmp_path, env={**os.environ},
        timeout=120,
    )
    regen = tmp_path / "tests" / "data" / "mini_beir"
    for rel in ("corpus.jsonl", "queries.jsonl",
                os.path.join("qrels", "test.tsv"),
                os.path.join("qrels", "dev.tsv")):
        with open(os.path.join(FIXTURE, rel), "rb") as f1, \
                open(regen / rel, "rb") as f2:
            assert f1.read() == f2.read(), f"{rel} drifted from generator"

"""CLI surface: index -> info -> query round trip, demo, bad input."""

import json

import pytest

from bm25_tpu.cli.main import main


def test_index_info_query_roundtrip(tmp_path, animal_corpus, capsys):
    corpus_file = tmp_path / "docs.txt"
    corpus_file.write_text("\n".join(animal_corpus))
    out = tmp_path / "idx"

    assert main(["index", str(corpus_file), "-o", str(out)]) == 0
    assert main(["info", str(out)]) == 0
    captured = capsys.readouterr().out
    info = json.loads(captured[captured.index("{"):])
    assert info["num_docs"] == 4 and info["vocab_size"] == 20

    assert main(["query", str(out), "does the fish purr like a cat?",
                 "-k", "2"]) == 0
    out_text = capsys.readouterr().out
    assert "doc=0" in out_text  # the cat doc ranks first
    assert "cat" in out_text


def test_query_jsonl_corpus(tmp_path, capsys, animal_corpus):
    corpus_file = tmp_path / "docs.jsonl"
    corpus_file.write_text(
        "\n".join(json.dumps({"id": i, "text": t}) for i, t in enumerate(animal_corpus))
    )
    out = tmp_path / "idx"
    assert main(["index", str(corpus_file), "-o", str(out)]) == 0
    assert main(["query", str(out), "bird that can fly", "-k", "1"]) == 0
    assert "doc=2" in capsys.readouterr().out


def test_demo(capsys):
    assert main(["demo", "-q", "sleeping rabbit", "-k", "2"]) == 0
    out = capsys.readouterr().out
    assert "sleeping rabbit" in out


def test_query_no_queries_error(tmp_path, animal_corpus, capsys):
    corpus_file = tmp_path / "docs.txt"
    corpus_file.write_text("\n".join(animal_corpus))
    out = tmp_path / "idx"
    main(["index", str(corpus_file), "-o", str(out)])
    assert main(["query", str(out)]) == 2


def test_query_term_boosts(tmp_path, animal_corpus, capsys):
    corpus_file = tmp_path / "docs.txt"
    corpus_file.write_text("\n".join(animal_corpus))
    out = tmp_path / "idx"
    assert main(["index", str(corpus_file), "-o", str(out)]) == 0
    capsys.readouterr()
    # plain: the cat doc wins; boosting fish flips the top hit
    assert main(["query", str(out), "fish^50 purr cat", "-k", "1"]) == 0
    boosted = capsys.readouterr().out
    assert "fish" in boosted.splitlines()[-1]


def test_read_corpus_text_line_starting_with_brace(tmp_path):
    """A plain-text corpus line that happens to start with '{' must index
    as text, not crash the build with a JSONDecodeError."""
    from bm25_tpu.cli.main import _read_corpus

    p = tmp_path / "docs.txt"
    p.write_text("{disputed} territory claims\n"
                 '{"text": "a real jsonl record"}\n'
                 "plain line\n")
    docs = _read_corpus(str(p))
    assert docs == ["{disputed} territory claims",
                    "a real jsonl record",
                    "plain line"]

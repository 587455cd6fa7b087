"""Tokenizer parity against the bundled reference index vocabulary."""

import numpy as np

from bm25_tpu.text.tokenizer import Tokenizer, pad_token_lists


def test_tokenize_animal_corpus_matches_reference_vocab(
    animal_corpus, reference_artifacts
):
    tok = Tokenizer()
    out = tok.tokenize_corpus(animal_corpus)
    ref_vocab = {k: v for k, v in reference_artifacts["vocab"].items() if k != ""}
    # identical term sets after stopwords + stemming
    assert set(out.vocab) == set(ref_vocab)
    # identical per-document multisets of terms
    inv = {v: k for k, v in out.vocab.items()}
    ref_terms_by_doc = [
        ["cat", "felin", "like", "purr"],
        ["dog", "human", "best", "friend", "love", "play"],
        ["bird", "beauti", "anim", "can", "fli"],
        ["fish", "creatur", "live", "water", "swim"],
    ]
    for ids, expected in zip(out.ids, ref_terms_by_doc):
        assert sorted(inv[t] for t in ids) == sorted(expected)


def test_tokenizer_pattern_drops_short_tokens():
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(["a I x ok yes"])
    inv = {v: k for k, v in out.vocab.items()}
    assert [inv[t] for t in out.ids[0]] == ["ok", "yes"]


def test_query_tokenization_oov_and_padding(animal_corpus):
    tok = Tokenizer()
    corpus = tok.tokenize_corpus(animal_corpus)
    q = tok.tokenize_queries(
        ["does the fish purr like a cat?", "zzz-unknown-term"], corpus.vocab
    )
    assert q.dtype == np.int32 and q.ndim == 2
    # row 0: fish purr like cat resolved; row 1 fully OOV -> all -1
    assert (q[0] >= 0).sum() == 4
    assert (q[1] == -1).all()


def test_pad_token_lists():
    m = pad_token_lists([[1, 2, 3], [4]], pad_to=5)
    assert m.shape == (2, 5)
    assert m[0, 3] == -1 and m[1, 1] == -1


def test_tokenize_queries_pad_to(animal_corpus):
    tok = Tokenizer()
    corpus = tok.tokenize_corpus(animal_corpus)
    q = tok.tokenize_queries(["cat"], corpus.vocab, pad_to=8)
    assert q.shape == (1, 8) and (q[0, 1:] == -1).all()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="more than pad_to"):
        tok.tokenize_queries(["cat feline purr fish bird"], corpus.vocab,
                             pad_to=2)


def test_tokenize_weighted_queries_mixed():
    import numpy as np

    from bm25_tpu.text.tokenizer import Tokenizer

    tok = Tokenizer(stopwords=None, stemmer=None)
    vocab = {"cat": 0, "dog": 1, "fish": 2}
    ids, wts = tok.tokenize_weighted_queries(
        ["cat dog cat", {"fish": 2.5, "unknown": 9.0}, "zzz"], vocab
    )
    assert ids.shape == wts.shape
    # row 0: plain string, per-occurrence unit weights
    assert ids[0].tolist()[:3] == [0, 1, 0]
    assert wts[0].tolist()[:3] == [1.0, 1.0, 1.0]
    # row 1: weighted term; OOV term dropped
    assert ids[1, 0] == 2 and wts[1, 0] == 2.5
    assert (ids[1, 1:] == -1).all()
    # row 2: fully OOV -> all pads, zero weights
    assert (ids[2] == -1).all() and (wts[2] == 0).all()


def test_parse_boosted():
    from bm25_tpu.text.tokenizer import Tokenizer

    assert Tokenizer.parse_boosted("fish cat") is None
    assert Tokenizer.parse_boosted("fish^2.5 cat") == {"fish": 2.5, "cat": 1.0}
    # repeated terms accumulate; integer boosts parse
    assert Tokenizer.parse_boosted("a^2 a b^3") == {"a": 3.0, "b": 3.0}
    # '^' without a numeric weight stays a literal token
    assert Tokenizer.parse_boosted("x^y z^1") == {"x^y": 1.0, "z": 1.0}


def test_parse_boosted_bare_decimal_weights():
    """'.5' and '2.' are valid float literals — they must parse as boosts,
    not silently stay literal at weight 1.0."""
    out = Tokenizer.parse_boosted("fish^.5 cat^2. dog")
    assert out == {"fish": 0.5, "cat": 2.0, "dog": 1.0}


def _fixture_lines():
    import os

    path = os.path.join(os.path.dirname(__file__), "data",
                        "english_fixture.txt")
    with open(path, encoding="utf-8") as f:
        return f.read().splitlines()


def test_english_fixture_is_substantial():
    """The tokenizer-parity fixture must stay a real corpus: VERDICT r4
    item 4 found the bm25s-pipeline parity claim resting on a 20-term
    vocab.  These floors keep a future edit from quietly shrinking it."""
    lines = _fixture_lines()
    assert len(lines) >= 250
    out = Tokenizer(use_native=False).tokenize_corpus(lines)
    assert len(out.vocab) >= 1200
    assert sum(len(d) for d in out.ids) >= 1500


def test_english_fixture_stopword_delta_bound():
    """Measured bound on stopword-list disagreement vs bm25s.

    bm25s's exact ``stopwords="en"`` list is not importable here (no
    egress, bm25s not installed); what IS known is its observable behavior
    on the bundled index (drops {is, and, to, the, that, in}, keeps
    {can} — text/stopwords.py).  Our STOPWORDS_EN and the minimal Lucene
    list bracket any plausible English list: tokens dropped by EN but not
    by Lucene are the only ones a different list could disagree on.  On
    this fixture that "borderline" fraction measures ~4.6% of the raw
    token stream — the documented upper bound in docs/migration.md.  This
    test pins the measurement so the doc number cannot rot silently.
    """
    import re

    from bm25_tpu.text.stopwords import STOPWORDS_EN, STOPWORDS_LUCENE

    rx = re.compile(r"(?u)\b\w\w+\b")
    toks = [w for line in _fixture_lines()
            for w in rx.findall(line.lower())]
    assert len(toks) >= 2500
    drop_en = sum(1 for w in toks if w in STOPWORDS_EN)
    border = sum(1 for w in toks
                 if w in STOPWORDS_EN and w not in STOPWORDS_LUCENE)
    assert STOPWORDS_LUCENE < STOPWORDS_EN  # bracket holds (strict subset)
    # measured on the committed fixture: 862/2704 = 31.9% dropped,
    # 124/2704 = 4.59% borderline.  Loose bands, not exact pins, so
    # fixture additions don't need test edits — but a band break means
    # the migration.md numbers need re-measuring
    assert 0.25 <= drop_en / len(toks) <= 0.40
    assert border / len(toks) <= 0.07


def test_pad_token_lists_pad_to_is_a_hard_cap():
    """Same contract as tokenize_queries: a longer row raises instead of
    silently widening the matrix past what the caller compiled for."""
    import pytest

    with pytest.raises(ValueError, match="pad_to"):
        pad_token_lists([[1, 2, 3, 4]], pad_to=2)
    m = pad_token_lists([[1, 2]], pad_to=4)
    assert m.shape == (1, 4)

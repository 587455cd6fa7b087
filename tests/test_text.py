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


def test_pad_token_lists_pad_to_is_a_hard_cap():
    """Same contract as tokenize_queries: a longer row raises instead of
    silently widening the matrix past what the caller compiled for."""
    import pytest

    with pytest.raises(ValueError, match="pad_to"):
        pad_token_lists([[1, 2, 3, 4]], pad_to=2)
    m = pad_token_lists([[1, 2]], pad_to=4)
    assert m.shape == (1, 4)

"""High-level Retriever facade round trip."""

import numpy as np

from bm25_tpu.retriever import Retriever
from bm25_tpu.text.tokenizer import Tokenizer


def test_fit_retrieve_save_load(tmp_path, animal_corpus):
    r = Retriever.fit(animal_corpus)
    docs, scores, texts = r.retrieve(
        ["does the fish purr like a cat?"], k=2, return_text=True
    )
    assert docs[0, 0] == 0
    assert "feline" in texts[0][0]

    r.save(str(tmp_path / "idx"))
    r2 = Retriever.load(str(tmp_path / "idx"))
    d2, s2, t2 = r2.retrieve(["bird that can fly"], k=1, return_text=True)
    assert d2[0, 0] == 2 and "bird" in t2[0][0]
    np.testing.assert_allclose(
        r.retrieve(["bird that can fly"], k=1)[1], s2, rtol=1e-6
    )


def test_retrieve_loads_reference_index(reference_index_dir):
    r = Retriever.load(reference_index_dir)
    docs, scores, texts = r.retrieve(
        ["does the fish purr like a cat?"], k=2, return_text=True
    )
    assert docs[0, 0] == 0 and "feline" in texts[0][0]


def test_retrieve_weighted_terms(tmp_path):
    from bm25_tpu.retriever import Retriever

    corpus = [
        "a cat is a feline and likes to purr",
        "a fish is a creature that lives in water and swims",
        "a bird is a beautiful animal that can fly",
        "a dog is the human's best friend and loves to play",
    ]
    r = Retriever.fit(corpus)
    docs, scores = r.retrieve(["fish purr cat"], k=4)
    assert docs[0, 0] == 0
    docs_w, scores_w = r.retrieve([{"fish": 50.0, "purr": 1, "cat": 1}], k=4)
    assert docs_w[0, 0] == 1
    # unit weights == plain text query
    docs_1, scores_1 = r.retrieve([{"fish": 1, "purr": 1, "cat": 1}], k=4)
    import numpy as np

    np.testing.assert_array_equal(docs_1, docs)
    np.testing.assert_allclose(scores_1, scores, rtol=1e-4, atol=1e-4)


def test_retrieve_accepts_bare_string_query(animal_corpus):
    from bm25_tpu.retriever import Retriever

    r = Retriever.fit(animal_corpus)
    docs, scores = r.retrieve("fish purr cat", k=2)
    assert docs.shape == (1, 2) and docs[0][0] == 0


def test_save_persists_mmap_corpus(tmp_path, animal_corpus):
    """load -> save must not silently drop the corpus texts."""
    from bm25_tpu.retriever import Retriever

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    Retriever.fit(animal_corpus).save(d1)
    r = Retriever.load(d1)  # corpus becomes an MMapCorpus
    r.save(d2)
    r2 = Retriever.load(d2)
    docs, scores, texts = r2.retrieve(["bird that can fly"], k=1,
                                      return_text=True)
    assert "fly" in texts[0][0]


def test_fit_accepts_generator_corpus():
    """build_index consumes the input; the stored corpus must still hold
    every text (regression: list(corpus) after consumption was empty)."""
    texts = ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"]
    r = Retriever.fit(iter(texts), tokenizer=Tokenizer(stopwords=None,
                                                       stemmer=None))
    assert r.text(2) == texts[2]
    docs, scores, out = r.retrieve(["delta epsilon"], k=1, return_text=True)
    assert out[0][0] == texts[1]


def test_tokenizer_config_round_trips_through_save_load(tmp_path):
    """An index built with a custom tokenizer must query with the SAME
    pipeline after load (regression: load silently used the default,
    missing the stemmed/filtered vocab)."""
    corpus = ["the running dogs are racing", "a sleeping cat sits quietly",
              "birds were flying southwards"]
    tok = Tokenizer(stopwords=None, stemmer="snowball-en")
    d = str(tmp_path / "idx")
    Retriever.fit(corpus, tokenizer=tok, save_to=d)
    r = Retriever.load(d)
    assert r.tokenizer.stopwords is None  # persisted config, not default
    assert r.tokenizer.stemmer == "snowball-en"
    # 'racing' only matches via the stemmer ('race' ~ 'racing' -> 'race')
    docs, scores = r.retrieve(["race dog"], k=1)
    assert scores[0][0] > 0 and docs[0][0] == 0
    # explicit override still wins
    r2 = Retriever.load(d, tokenizer=Tokenizer(stopwords=None, stemmer=None))
    assert r2.tokenizer.stemmer is None


def test_save_preserves_dict_corpus_metadata(tmp_path):
    """dict documents keep every field across save (regression: save
    flattened records to bare text, dropping metadata)."""
    from bm25_tpu.index.io import MMapCorpus, save_corpus

    recs = [{"id": "a7", "title": "T", "text": "quick brown fox"},
            {"id": "b9", "title": "U", "text": "lazy dog sleeps"}]
    d = str(tmp_path / "c")
    save_corpus(d, recs)
    mm = MMapCorpus.open(d)
    assert mm[0]["title"] == "T" and mm[0]["id"] == "a7"

    # a loaded retriever re-saving elsewhere streams + preserves dicts
    corpus = ["quick brown fox", "lazy dog sleeps"]
    src = str(tmp_path / "src")
    r = Retriever.fit(corpus, tokenizer=Tokenizer(stopwords=None,
                                                  stemmer=None), save_to=src)
    loaded = Retriever.load(src)
    dst = str(tmp_path / "dst")
    loaded.save(dst)
    mm2 = MMapCorpus.open(dst)
    assert mm2[1]["text"] == "lazy dog sleeps"
    # saving back into the SOURCE dir must not truncate the mmap corpus
    # out from under its own reader
    loaded.save(src)
    assert loaded.text(0) == "quick brown fox"
    again = Retriever.load(src)
    assert again.text(1) == "lazy dog sleeps"


# -- explain (per-term score breakdown) --------------------------------------


def _oracle_score(r, query_ids, doc_id):
    from bm25_tpu.reference import ReferenceEngine

    eng = ReferenceEngine.from_scored_index(r.index)
    return float(eng.get_scores(np.asarray(query_ids))[doc_id])


def test_explain_matches_engine_scores(animal_corpus):
    r = Retriever.fit(animal_corpus)
    q = "does the fish purr like a cat?"
    docs, scores = r.retrieve([q], k=4)
    for d, s in zip(docs[0], scores[0]):
        exp = r.explain(q, int(d))
        assert exp["doc_id"] == int(d)
        np.testing.assert_allclose(exp["score"], float(s), rtol=1e-5)
        # contributions sum to the reported score
        np.testing.assert_allclose(
            sum(t["contribution"] for t in exp["terms"]), exp["score"],
            rtol=1e-5,
        )
        # matched terms carry positive df and idf; tf_score = data value
        for t in exp["terms"]:
            if t["matched"]:
                assert t["df"] > 0 and t["idf"] > 0 and t["tf_score"] > 0
            else:
                assert t["tf_score"] == 0.0


def test_explain_aggregates_repeats_and_flags_oov(animal_corpus):
    r = Retriever.fit(animal_corpus)
    exp = r.explain("cat cat zzzunknownzzz", 0)
    by_term = {t["term"]: t for t in exp["terms"]}
    assert by_term["cat"]["weight"] == 2.0
    oov = by_term["zzzunknownzzz"]
    assert oov["token_id"] == -1 and not oov["matched"]
    assert oov["contribution"] == 0.0
    # repeated token scores per occurrence: equals the oracle on [cat, cat]
    cat_id = r.index.vocab[r.tokenizer.words("cat")[0]]
    np.testing.assert_allclose(
        exp["score"], _oracle_score(r, [cat_id, cat_id], 0), rtol=1e-6
    )


def test_explain_weighted_and_multiword_terms(animal_corpus):
    r = Retriever.fit(animal_corpus)
    q = {"fish swims": 2.5, "purr": 0.5, "zzznope": 3.0}
    exp = r.explain(q, 3)
    # multi-word term contributes one entry per token at the term weight
    fish_entries = [t for t in exp["terms"] if t["term"] == "fish swims"]
    assert len(fish_entries) == 2
    assert all(t["weight"] == 2.5 for t in fish_entries)
    # OOV dict term surfaces (token_id -1, no silent drop)
    assert any(t["term"] == "zzznope" and t["token_id"] == -1
               for t in exp["terms"])
    # total matches what retrieve reports for this doc
    docs, scores = r.retrieve([q], k=4)
    row = {int(d): float(s) for d, s in zip(docs[0], scores[0])}
    np.testing.assert_allclose(exp["score"], row[3], rtol=1e-5)


def test_explain_nonoccurrence_offset_methods(animal_corpus):
    """bm25+ carries a per-query-token offset for every doc — explain must
    include it even for unmatched tokens (reference semantics: the oracle
    adds token_offsets[q].sum() uniformly)."""
    from bm25_tpu.scoring import BM25Params

    r = Retriever.fit(animal_corpus, params=BM25Params(method="bm25+"))
    assert r.index.token_offsets is not None
    # doc 1 (dog doc) does not contain "fish": offset-only contribution
    exp = r.explain("fish", 1)
    (t,) = exp["terms"]
    assert not t["matched"] and t["offset"] > 0
    np.testing.assert_allclose(t["contribution"], t["offset"], rtol=1e-6)
    fish_id = r.index.vocab[r.tokenizer.words("fish")[0]]
    np.testing.assert_allclose(
        exp["score"], _oracle_score(r, [fish_id], 1), rtol=1e-6
    )
    # and a matched doc (3: the fish doc) combines tf_score + offset
    exp0 = r.explain("fish", 3)
    (t0,) = exp0["terms"]
    assert t0["matched"]
    np.testing.assert_allclose(
        t0["contribution"], t0["tf_score"] + t0["offset"], rtol=1e-6
    )


def test_explain_validates_inputs(animal_corpus):
    import pytest

    r = Retriever.fit(animal_corpus)
    with pytest.raises(ValueError, match="out of range"):
        r.explain("cat", 99)
    with pytest.raises(ValueError, match="out of range"):
        r.explain("cat", -1)

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

"""High-level Retriever facade round trip."""

import numpy as np

from bm25_tpu.retriever import Retriever


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

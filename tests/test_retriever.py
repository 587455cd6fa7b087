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

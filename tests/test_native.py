"""Native C++ text pipeline vs the pure-Python oracle."""

import os
import random

import numpy as np
import pytest

SO = os.path.join(os.path.dirname(__file__), "..", "bm25_tpu", "native",
                  "libbm25text.so")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SO), reason="native lib not built (make -C bm25_tpu/native)"
)


@pytest.fixture(scope="module")
def native():
    from bm25_tpu.native.text_native import NativeTextPipeline

    return NativeTextPipeline(os.path.abspath(SO))


def test_stemmer_matches_nltk_fuzz(native):
    from nltk.stem import SnowballStemmer

    s = SnowballStemmer("english")
    rng = random.Random(0)
    sufs = ["ing", "ed", "ies", "ization", "ational", "fulness", "ogi",
            "ively", "ement", "ance", "e", "l", "eedly", "sses", "'s"]
    for _ in range(3000):
        base = "".join(rng.choice("aeiouybcdfglmnprst'") for _ in range(rng.randint(1, 10)))
        w = base + rng.choice(sufs + [""])
        assert native.stem(w) == s.stem(w), w


def test_stemmer_reference_vocabulary(native):
    # stems visible in /root/reference/animal_index_bm25/vocab.index.json
    expected = {
        "feline": "felin", "likes": "like", "beautiful": "beauti",
        "animal": "anim", "fly": "fli", "creature": "creatur",
        "lives": "live", "swims": "swim", "humans": "human", "loves": "love",
    }
    for w, e in expected.items():
        assert native.stem(w) == e


def test_tokenize_corpus_matches_python(native, animal_corpus, fox_corpus):
    from bm25_tpu.text.stopwords import STOPWORDS_EN
    from bm25_tpu.text.tokenizer import Tokenizer

    docs = animal_corpus + fox_corpus + [
        "Numbers 123 and under_scores plus MixedCASE words!",
        "repeated repeated repeated tokens tokens",
        "",
        "a",  # single short token only
    ]
    py = Tokenizer(use_native=False).tokenize_corpus(docs)
    nat = native.tokenize_corpus(docs, stopwords=STOPWORDS_EN)
    assert py.vocab == nat.vocab
    for a, b in zip(py.ids, nat.ids):
        np.testing.assert_array_equal(a, b)


def test_tokenizer_auto_uses_native(native, animal_corpus):
    """Tokenizer(use_native=True) routes through the shared library."""
    from bm25_tpu.text.tokenizer import Tokenizer

    t_on = Tokenizer(use_native=True).tokenize_corpus(animal_corpus)
    t_off = Tokenizer(use_native=False).tokenize_corpus(animal_corpus)
    assert t_on.vocab == t_off.vocab
    for a, b in zip(t_on.ids, t_off.ids):
        np.testing.assert_array_equal(a, b)


def test_tokenizer_unicode_parity_with_native_enabled(native):
    """Non-ASCII docs route through the Python oracle path even when the
    native fast path is enabled (ADVICE r1: the C++ tokenizer treats bytes
    >= 0x80 as word chars and never folds/stems non-ASCII, so corpus and
    query tokenization would silently diverge)."""
    from bm25_tpu.text.tokenizer import Tokenizer

    docs = [
        "the quick brown fox jumps over lazy dogs",
        "Über das schöne Café — naïve Träume!",
        "plain ascii document about felines and dogs",
        "cafÉ people… enjoy coffee’s aroma",
        "mixed doc: naïve cats eat ASCII food",
    ]
    t_on = Tokenizer(use_native=True).tokenize_corpus(docs)
    t_off = Tokenizer(use_native=False).tokenize_corpus(docs)
    # the hybrid path renumbers ids to first-occurrence order, so the
    # result is IDENTICAL to the pure-Python path (vocab ids included)
    assert t_on.vocab == t_off.vocab
    for a, b in zip(t_on.ids, t_off.ids):
        np.testing.assert_array_equal(a, b)
    # query-time tokens must hit the corpus vocab (the round-1 failure mode
    # was 'über'/'café' OOV because the corpus kept 'Über'/'cafÉ')
    tok = Tokenizer(use_native=True)
    q = tok.tokenize_queries(["über café naïve"], t_on.vocab)
    assert (q >= 0).sum() == 3


def test_tokenizer_all_non_ascii_corpus(native):
    from bm25_tpu.text.tokenizer import Tokenizer

    docs = ["schöne Träume über alles", "naïve café präzise"]
    t_on = Tokenizer(use_native=True).tokenize_corpus(docs)
    t_off = Tokenizer(use_native=False).tokenize_corpus(docs)
    assert t_on.vocab == t_off.vocab
    for a, b in zip(t_on.ids, t_off.ids):
        np.testing.assert_array_equal(a, b)


def test_native_csc_build_matches_numpy(native):
    """C++ counting-sort CSC builder is byte-identical to the numpy path."""
    import bm25_tpu.native.loader as loader
    from bm25_tpu.scoring import BM25Params, build_scored_index_flat

    rng = random.Random(7)
    nprng = np.random.default_rng(7)
    for trial in range(4):
        num_docs = rng.randint(1, 300)
        vocab = rng.randint(1, 80)
        lengths = np.maximum(
            0, nprng.poisson(rng.randint(1, 30), num_docs)
        ).astype(np.int32)
        flat = nprng.integers(0, vocab, int(lengths.sum()), dtype=np.int32)
        method = ["lucene", "robertson", "bm25+"][trial % 3]
        kw = dict(vocab_size=vocab, params=BM25Params(method=method))
        idx_native = build_scored_index_flat(flat, lengths, **kw)
        saved_cached, saved_checked = loader._cached, loader._checked
        loader._cached, loader._checked = None, True  # force numpy fallback
        try:
            idx_numpy = build_scored_index_flat(flat, lengths, **kw)
        finally:
            loader._cached, loader._checked = saved_cached, saved_checked
        np.testing.assert_array_equal(idx_native.indptr, idx_numpy.indptr)
        np.testing.assert_array_equal(idx_native.indices, idx_numpy.indices)
        np.testing.assert_array_equal(idx_native.data, idx_numpy.data)
        np.testing.assert_array_equal(
            idx_native.token_offsets, idx_numpy.token_offsets
        )


def test_native_csc_build_empty_and_unit_cases(native):
    from bm25_tpu.native.text_native import NativeTextPipeline  # noqa: F401

    out = native.build_tf_csc(
        np.array([2, 2, 0], np.int32), np.array([3], np.int32), vocab_size=4
    )
    indptr, docs, tf = out
    np.testing.assert_array_equal(indptr, [0, 1, 1, 2, 2])
    np.testing.assert_array_equal(docs, [0, 0])
    np.testing.assert_array_equal(tf, [1.0, 2.0])


def test_native_csc_build_rejects_out_of_range_ids(native):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="token ids"):
        native.build_tf_csc(
            np.array([0, 5], np.int32), np.array([2], np.int32), vocab_size=3
        )
    with _pytest.raises(ValueError, match="sum"):
        native.build_tf_csc(
            np.array([0, 1], np.int32), np.array([3], np.int32), vocab_size=3
        )


def test_native_csc_rejects_wide_dtype_wraparound(native):
    """int64 ids past 2^32 must raise, not silently wrap through the int32
    cast into a 'valid' wrong index (reproduced pre-fix)."""
    with pytest.raises(ValueError, match="token ids must be in"):
        native.build_tf_csc(np.array([2**32 + 5], dtype=np.int64),
                            np.array([1], np.int32), vocab_size=10)


def test_native_csc_rejects_out_of_range_int32_ids(native):
    """int32 inputs skip the host sweeps; the native histogram pass itself
    bounds-checks and the wrapper maps the error to ValueError."""
    with pytest.raises(ValueError, match="token ids must be in"):
        native.build_tf_csc(np.array([3, 99], dtype=np.int32),
                            np.array([2], np.int32), vocab_size=10)
    with pytest.raises(ValueError, match="token ids must be in"):
        native.build_tf_csc(np.array([-4], dtype=np.int32),
                            np.array([1], np.int32), vocab_size=10)


def test_native_csc_rejects_negative_vocab(native):
    with pytest.raises(ValueError, match="vocab_size"):
        native.build_tf_csc(np.zeros(0, np.int32), np.zeros(0, np.int32),
                            vocab_size=-5)


def test_fixture_token_stream_native_matches_python(native):
    """Natural-English fixture (263 sentences, ~2.7k tokens): the native
    C++ pipeline must produce the IDENTICAL token-id stream and vocab as
    the Python oracle — the random-suffix fuzz above never exercised real
    morphology at this density (VERDICT r4 item 4)."""
    import os

    from bm25_tpu.text.tokenizer import Tokenizer

    path = os.path.join(os.path.dirname(__file__), "data",
                        "english_fixture.txt")
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    py = Tokenizer(use_native=False).tokenize_corpus(lines)
    nat = Tokenizer(use_native=True).tokenize_corpus(lines)
    assert py.vocab == nat.vocab
    for a, b in zip(py.ids, nat.ids):
        np.testing.assert_array_equal(a, b)


def test_fixture_stems_native_matches_nltk_exhaustive(native):
    """Every unique non-stopword surface form in the fixture stems
    identically under the native Snowball and NLTK (measured 0/1602
    diffs; docs/migration.md cites this number)."""
    import os
    import re

    from nltk.stem import SnowballStemmer

    from bm25_tpu.text.stopwords import STOPWORDS_EN

    s = SnowballStemmer("english")
    path = os.path.join(os.path.dirname(__file__), "data",
                        "english_fixture.txt")
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    rx = re.compile(r"(?u)\b\w\w+\b")
    uniq = sorted({w for line in lines for w in rx.findall(line.lower())
                   if w not in STOPWORDS_EN})
    assert len(uniq) >= 1500
    diffs = [w for w in uniq if native.stem(w) != s.stem(w)]
    assert diffs == [], f"{len(diffs)} stem divergences, e.g. {diffs[:10]}"


def test_native_stem_lowercases_like_nltk(native):
    """NLTK SnowballStemmer.stem lowercases; the native entry point must
    match (uppercase input mangled the internal 'Y' marker pre-fix)."""
    assert native.stem("TYPE") == "type"
    assert native.stem("Feline") == "felin"
    assert native.stem("Running") == "run"

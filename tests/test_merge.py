"""Multi-host shard merge == single-host build, bit-exact."""

import numpy as np

from bm25_tpu.index.merge import merge_shard_indexes, merge_tokenized_shards
from bm25_tpu.parallel.distributed import DocShardPlan
from bm25_tpu.scoring import build_scored_index
from bm25_tpu.text.tokenizer import Tokenizer


def test_merge_matches_single_host_build(zipf_corpus_small):
    tok = Tokenizer(stopwords=None, stemmer=None)
    full = tok.tokenize_corpus(zipf_corpus_small)
    single = build_scored_index(full.ids, vocab_size=len(full.vocab),
                                vocab=full.vocab)

    # simulate 3 hosts tokenizing their ranges independently
    plan = DocShardPlan(num_docs=len(zipf_corpus_small), num_hosts=3,
                        num_devices_global=3)
    shards = []
    for h in range(3):
        lo, hi = plan.host_range(h)
        shards.append(
            Tokenizer(stopwords=None, stemmer=None).tokenize_corpus(
                zipf_corpus_small[lo:hi]
            )
        )
    merged = merge_shard_indexes(shards)

    assert merged.num_docs == single.num_docs
    assert merged.vocab == single.vocab  # first-occurrence order is identical
    np.testing.assert_array_equal(merged.indptr, single.indptr)
    np.testing.assert_array_equal(merged.indices, single.indices)
    np.testing.assert_array_equal(merged.data, single.data)


def test_merge_tokenized_shards_remaps_vocab():
    t = Tokenizer(stopwords=None, stemmer=None)
    s1 = t.tokenize_corpus(["alpha beta", "beta gamma"])
    s2 = Tokenizer(stopwords=None, stemmer=None).tokenize_corpus(
        ["gamma delta", "alpha"]
    )
    m = merge_tokenized_shards([s1, s2])
    assert m.num_docs == 4
    inv = {v: k for k, v in m.vocab.items()}
    assert [inv[i] for i in m.ids[2]] == ["gamma", "delta"]
    assert [inv[i] for i in m.ids[3]] == ["alpha"]

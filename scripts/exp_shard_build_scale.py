"""Sharded build + merge at scale: two worker processes, bit-exact merge.

Simulates the multi-host (DCN) build path at 600K docs: a DocShardPlan
splits the corpus, two subprocesses tokenize+spill their shard
independently (the per-host work), the parent merges the tokenized
shards and scores once — then verifies the merged index is bit-identical
to a single-process build of the whole corpus.  Host-only.
"""

import pickle
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

WORKER = r"""
import pickle, sys
sys.path.insert(0, "/root/repo")
import numpy as np
from bm25_tpu.text.tokenizer import Tokenizer

lo, hi, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
rng = np.random.default_rng(9)  # same corpus generator as the parent
num_docs, vocab = 600_000, 40_000
lens = rng.integers(8, 48, size=num_docs)
docs = [" ".join(f"w{t}" for t in rng.integers(0, vocab, size=n))
        for n in lens]
tok = Tokenizer(stopwords=None, stemmer=None)
out = tok.tokenize_corpus(docs[lo:hi])
with open(out_path, "wb") as f:
    pickle.dump({"ids": out.ids, "vocab": out.vocab}, f)
"""


def main() -> None:
    from bm25_tpu.index.merge import merge_tokenized_shards
    from bm25_tpu.parallel.distributed import DocShardPlan
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import TokenizedCorpus, Tokenizer

    num_docs, vocab = 600_000, 40_000
    plan = DocShardPlan(num_docs=num_docs, num_hosts=2, num_devices_global=2)
    ranges = [plan.host_range(h) for h in range(2)]
    print(f"[shard] plan: {ranges}", flush=True)

    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as d:
        procs = []
        for h, (lo, hi) in enumerate(ranges):
            out_path = f"{d}/shard{h}.pkl"
            procs.append((out_path, subprocess.Popen(
                [sys.executable, "-c", WORKER, str(lo), str(hi), out_path]
            )))
        shards = []
        for out_path, p in procs:
            assert p.wait() == 0
            with open(out_path, "rb") as f:
                blob = pickle.load(f)
            shards.append(TokenizedCorpus(ids=blob["ids"], vocab=blob["vocab"]))
    merged = merge_tokenized_shards(shards)
    idx = build_scored_index(
        merged.ids, vocab_size=len(merged.vocab), vocab=merged.vocab
    )
    dt = time.perf_counter() - t0
    print(f"[shard] 2-proc build+merge: {dt:.0f}s ({num_docs/dt:.0f} docs/s) "
          f"nnz={idx.nnz}", flush=True)

    # single-process ground truth (same corpus)
    rng = np.random.default_rng(9)
    lens = rng.integers(8, 48, size=num_docs)
    docs = [" ".join(f"w{t}" for t in rng.integers(0, vocab, size=n))
            for n in lens]
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(docs)
    ref = build_scored_index(out.ids, vocab_size=len(out.vocab), vocab=out.vocab)

    assert idx.vocab == ref.vocab
    np.testing.assert_array_equal(idx.indptr, ref.indptr)
    np.testing.assert_array_equal(idx.indices, ref.indices)
    np.testing.assert_array_equal(idx.data, ref.data)
    print("[shard] merged index bit-identical to the single-process build",
          flush=True)


if __name__ == "__main__":
    main()

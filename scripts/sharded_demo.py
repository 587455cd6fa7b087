#!/usr/bin/env python3
"""End-to-end multi-chip flow: streaming shard build -> merge -> doc-sharded
serving with ICI top-k merge.

The shape of BASELINE config 5 (Wikipedia-scale corpus, doc-sharded across a
v5e-8 slice), runnable anywhere via a virtual CPU mesh:

    python scripts/sharded_demo.py --devices 8 --docs 20000

Flow: each "host" tokenizes its document range (parallel.distributed.
DocShardPlan + index.streaming), shards merge into one global index
(index.merge, bit-identical to a single-host build), and the
ShardedSparseEngine serves it doc-sharded over the (data, docs) mesh.
"""

import argparse
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--docs", type=int, default=20000)
    p.add_argument("--hosts", type=int, default=4)
    p.add_argument("--queries", type=int, default=64)
    p.add_argument("--top-k", type=int, default=10)
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    except Exception:
        pass
    if len(jax.devices()) < args.devices:
        print(f"only {len(jax.devices())} devices visible", file=sys.stderr)
        return 1

    import numpy as np

    from bm25_tpu.datasets import synthetic_corpus
    from bm25_tpu.index.merge import merge_shard_indexes
    from bm25_tpu.parallel.distributed import DocShardPlan
    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.reference import ReferenceEngine
    from bm25_tpu.text.tokenizer import Tokenizer

    corpus = synthetic_corpus(args.docs, vocab=5000, avg_len=30)
    plan = DocShardPlan(num_docs=args.docs, num_hosts=args.hosts,
                        num_devices_global=args.devices)

    t0 = time.perf_counter()
    shards = []
    for h in range(args.hosts):
        lo, hi = plan.host_range(h)
        shards.append(Tokenizer().tokenize_corpus(corpus[lo:hi]))
        print(f"host {h}: tokenized docs [{lo}, {hi})")
    index = merge_shard_indexes(shards)
    print(f"merged global index: {index.num_docs} docs, vocab "
          f"{index.vocab_size}, nnz {index.nnz} "
          f"({time.perf_counter() - t0:.1f}s)")

    mesh = make_mesh(args.devices, data=2 if args.devices % 2 == 0 else 1)
    engine = ShardedSparseEngine.from_scored_index(index, mesh=mesh)
    print(f"mesh: {dict(mesh.shape)}; index doc-sharded over "
          f"{mesh.shape['docs']} shards")

    tok = Tokenizer()
    rng = np.random.default_rng(0)
    texts = [corpus[i] for i in rng.choice(args.docs, args.queries)]
    queries = tok.tokenize_queries([" ".join(t.split()[:5]) for t in texts],
                                   index.vocab)
    t0 = time.perf_counter()
    docs, scores = engine.search(queries, top_k=args.top_k)
    dt = time.perf_counter() - t0
    print(f"sharded search: {args.queries} queries in {dt*1e3:.0f} ms "
          f"(incl. compile)")

    # cross-check vs the host oracle
    od, os_ = ReferenceEngine.from_scored_index(index).search(
        queries, top_k=args.top_k
    )
    np.testing.assert_allclose(scores, os_, rtol=1e-4, atol=1e-5)
    print("score parity vs oracle: OK")
    hit1 = float(np.mean(docs[:, 0] == od[:, 0]))
    print(f"top-1 agreement with oracle: {hit1:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

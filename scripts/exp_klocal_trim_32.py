"""Validate the S>=32 shard-local top-k trim on a 32-device CPU mesh.

NOTES r3 finding 7 shipped `choose_k_local`'s trim (each shard returns
~2k/S + 64 candidates above 32 shards, with an exactness check + full-k
lax.cond fallback) as modeled-but-locally-untested: the test mesh is 8
devices.  A 32-device virtual CPU mesh exercises the trim for real —
including an adversarial all-tied corpus that forces the fallback.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 32)

    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import (
        ShardedSparseEngine, choose_k_local)
    from bm25_tpu.reference import ReferenceEngine
    from bm25_tpu.scoring import build_scored_index

    assert len(jax.devices()) == 32
    k = 100
    m = choose_k_local(k, 32)
    assert m < k, (m, k)
    print(f"[trim] S=32 k={k} -> k_local={m}", flush=True)

    rng = np.random.default_rng(0)
    vocab = 400
    docs = [rng.integers(0, vocab, size=rng.integers(4, 30)).astype(np.int32)
            for _ in range(2000)]
    idx = build_scored_index(docs, vocab_size=vocab)
    mesh = make_mesh(32)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh, hot_tokens=8)
    oracle = ReferenceEngine.from_scored_index(idx)
    queries = rng.integers(-1, vocab, size=(16, 6), dtype=np.int32)
    dd, ds = eng.search(queries, top_k=k)
    od, os_ = oracle.search(queries, top_k=k)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)
    print("[trim] zipf corpus: trimmed merge exact vs oracle", flush=True)

    # adversarial: every doc identical -> every shard's m-th candidate
    # ties the merged k-th score -> the strict exactness check must fail
    # and the full-k fallback branch must produce the exact answer
    docs_tied = [np.array([0, 1], np.int32) for _ in range(2000)]
    idx_t = build_scored_index(docs_tied, vocab_size=vocab)
    eng_t = ShardedSparseEngine.from_scored_index(idx_t, mesh=mesh,
                                                  hot_tokens=0)
    oracle_t = ReferenceEngine.from_scored_index(idx_t)
    q = np.array([[0, 1, -1, -1]], np.int32)
    dd, ds = eng_t.search(q, top_k=k)
    od, os_ = oracle_t.search(q, top_k=k)
    np.testing.assert_allclose(ds, os_, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(dd, od)  # tie contract: ascending ids
    print("[trim] all-tied corpus: fallback branch exact, tie contract "
          "holds", flush=True)

    # forced trim exactness under doc_mask + weights composition
    w = rng.uniform(0.5, 2.0, size=queries.shape).astype(np.float32)
    mask = rng.random(idx.num_docs) < 0.5
    dd, ds = eng.search(queries, top_k=k, weights=w, doc_mask=mask)
    od, os_ = oracle.search(queries, top_k=k, weights=w, doc_mask=mask)
    np.testing.assert_allclose(ds, os_, rtol=2e-5, atol=2e-5)
    print("[trim] masked+weighted through the trim: exact", flush=True)
    print("[trim] OK", flush=True)


if __name__ == "__main__":
    main()

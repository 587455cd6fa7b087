#!/usr/bin/env python3
"""Sharded engine x slot-tiled wide buckets ON THE REAL CHIP.

The slot-tiled fused kernel lowers inside the sharded local step only on
the CPU mesh (dryrun gate + tests); this drives ShardedSparseEngine over
a 1-device TPU mesh on a long-document corpus whose widest bucket
exceeds SLOT_TILE — shard_map + Mosaic legality of the slot-tiled
kernels is a hardware question the CPU mesh cannot answer (NOTES: the
same gap existed for the single-chip path until exp_wide_bucket_tpu).
Oracle parity at k=100/1000 plus weighted + masked searches.
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    assert jax.devices()[0].platform != "cpu", "needs the real chip"

    from bm25_tpu.bench.query_bench import _zipf_probs, recall_at_k
    from bm25_tpu.ops.ell_score import SLOT_TILE
    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.reference import ReferenceEngine
    from bm25_tpu.scoring import build_scored_index_flat

    num_docs, vocab = 65536, 16384
    rng = np.random.default_rng(3)
    cum = np.cumsum(_zipf_probs(vocab))
    is_long = rng.random(num_docs) < 0.2
    lengths = np.where(
        is_long,
        np.maximum(1500, rng.poisson(4000, num_docs)),
        np.maximum(8, rng.poisson(150, num_docs)),
    ).astype(np.int32)
    flat = np.searchsorted(cum, rng.random(int(lengths.sum()))).astype(np.int32)
    np.clip(flat, 0, vocab - 1, out=flat)
    index = build_scored_index_flat(flat, lengths, vocab_size=vocab)
    print(f"[shld] {num_docs} docs nnz={index.nnz}", flush=True)

    mesh = make_mesh()  # 1 real device -> (data=1, docs=1)
    eng = ShardedSparseEngine.from_scored_index(index, mesh=mesh)
    widths = [b["tokT"].shape[0] for b in eng.buckets if "tokT" in b]
    print(f"[shld] mesh={dict(mesh.shape)} widths={widths} "
          f"hot_h={eng.hot_h}", flush=True)
    assert widths and max(widths) > SLOT_TILE, (
        "corpus failed to engage slot tiling in the sharded layout")

    qrng = np.random.default_rng(17)
    queries = np.clip(
        np.searchsorted(cum, qrng.random((128, 8))), 0, vocab - 1
    ).astype(np.int32)
    oracle = ReferenceEngine.from_scored_index(index)

    for k in (100, 1000):
        dd, ds = eng.search(queries, top_k=k)
        od, os_ = oracle.search(queries, top_k=k)
        rec = recall_at_k(np.asarray(dd), od)
        err = float(np.max(np.abs(np.asarray(ds) - os_)))
        print(f"[shld] k={k}: recall={rec:.4f} max_err={err:.2e}", flush=True)
        assert rec >= 0.9999, rec

    # weighted + masked composition through the same sharded step
    w = {int(queries[0, 0]): 2.5, int(queries[0, 1]): 0.5}
    wq = np.full((4, 8), -1, np.int32)
    wq[:, :2] = [list(w)] * 4
    ww = np.zeros((4, 8), np.float32)
    ww[:, :2] = [list(w.values())] * 4
    dd, _ = eng.search(wq, top_k=50, weights=ww)
    ow, _ = oracle.search(wq, top_k=50, weights=ww)
    assert np.array_equal(np.asarray(dd), ow), "weighted parity"
    mask = np.zeros(num_docs, dtype=bool)
    mask[rng.choice(num_docs, 5000, replace=False)] = True
    dd, _ = eng.search(queries[:16], top_k=100, doc_mask=mask)
    om, _ = oracle.search(queries[:16], top_k=100, doc_mask=mask)
    rec = recall_at_k(np.asarray(dd), om)
    print(f"[shld] masked recall@100={rec:.4f}", flush=True)
    assert rec >= 0.999, rec
    print("[shld] OK", flush=True)


if __name__ == "__main__":
    main()

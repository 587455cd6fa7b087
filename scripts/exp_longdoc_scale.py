"""Long-document corpus characterization of the slot-tiled ELL path.

exp_wide_bucket_tpu.py proved Mosaic legality on a toy corpus; this run
measures the slot-tiled kernels at a realistic long-document shape (the
BASELINE Wikipedia config class): 131K docs with a 20% long-document
mixture whose widest ELL bucket exceeds SLOT_TILE, auto hot tier, cold
routing, device-step timing at k=100/1000 and oracle recall.
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

    from bm25_tpu.bench.query_bench import (
        _zipf_probs, measure_device_step_ms, recall_at_k)
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.ops.ell_score import SLOT_TILE
    from bm25_tpu.reference import ReferenceEngine
    from bm25_tpu.scoring import build_scored_index_flat

    num_docs, vocab = 131072, 32768
    rng = np.random.default_rng(7)
    cum = np.cumsum(_zipf_probs(vocab))

    # 80% short docs (~150 tokens), 20% article-length (~4000): after the
    # hot tier strips the Zipf head, the long tail's COLD unique-token
    # counts must still push the widest bucket past SLOT_TILE
    is_long = rng.random(num_docs) < 0.2
    lengths = np.where(
        is_long,
        np.maximum(1500, rng.poisson(4000, num_docs)),
        np.maximum(8, rng.poisson(150, num_docs)),
    ).astype(np.int32)
    flat = np.searchsorted(cum, rng.random(int(lengths.sum()))).astype(np.int32)
    np.clip(flat, 0, vocab - 1, out=flat)
    print(f"[longdoc] {num_docs} docs, {int(lengths.sum())} tokens "
          f"(mean len {lengths.mean():.0f}, max {lengths.max()})", flush=True)

    index = build_scored_index_flat(flat, lengths, vocab_size=vocab)
    eng = SparseEngine.from_scored_index(index, max_buckets=4)
    widths = [b["tokT"].shape[0] for b in eng.buckets if "tokT" in b]
    rows = [b["doc_ids"].shape[0] for b in eng.buckets]
    print(f"[longdoc] bucket widths {widths} rows {rows} "
          f"SLOT_TILE={SLOT_TILE} hot_h={eng.hot_h}", flush=True)
    assert max(widths) > SLOT_TILE, "corpus failed to engage slot tiling"

    qrng = np.random.default_rng(11)
    queries = np.clip(
        np.searchsorted(cum, qrng.random((512, 8))), 0, vocab - 1
    ).astype(np.int32)

    for k in (1000, 100):
        ms = measure_device_step_ms(eng, queries, k)
        print(f"[longdoc] k={k}: device step {ms:.1f} ms / 512 queries "
              f"-> {512 / ms * 1e3:.0f} qps hardware-side", flush=True)

    oracle = ReferenceEngine.from_scored_index(index)
    sub = queries[:64]
    dd, ds = eng.search(sub, top_k=100)
    od, os_ = oracle.search(sub, top_k=100)
    rec = recall_at_k(np.asarray(dd), od)
    err = float(np.abs(np.asarray(ds) - os_).max())
    print(f"[longdoc] recall@100 {rec:.4f} max |score err| {err:.2e}",
          flush=True)
    assert rec >= 0.999
    print("[longdoc] OK", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""SLOT_TILE sweep on the long-document shape (the only tiling knob the
slot-tiled kernels added that has never been measured — 512 was chosen
for VMEM legality, not speed).

Uses the exp_longdoc_scale.py corpus (131K docs / 120M tokens, widest
bucket ~1208 slots) so each tile value re-buckets + re-uploads in about
a minute.  The scan is VPU-compare-bound, so the op count is invariant;
what the tile size changes is pipeline granularity (smaller tiles =
more grid steps + more accumulator re-reads, larger tiles = bigger VMEM
blocks and a taller hot cap denominator).
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
    import importlib

    from bm25_tpu.models import sparse as sparse_mod
    from bm25_tpu.reference import ReferenceEngine

    # the ops package re-exports a FUNCTION named ell_score which shadows
    # the submodule in `from bm25_tpu.ops import ell_score`
    ell_score = importlib.import_module("bm25_tpu.ops.ell_score")
    from bm25_tpu.scoring import build_scored_index_flat

    num_docs, vocab = 131072, 32768
    rng = np.random.default_rng(7)
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
    print(f"[tile] corpus {num_docs} docs nnz={index.nnz}", flush=True)

    qrng = np.random.default_rng(11)
    queries = np.clip(
        np.searchsorted(cum, qrng.random((512, 8))), 0, vocab - 1
    ).astype(np.int32)
    oracle = ReferenceEngine.from_scored_index(index)
    od, _ = oracle.search(queries[:64], top_k=100)

    tiles = tuple(
        int(x) for x in os.environ.get("TILES", "128,256,512,768").split(",")
    )
    # PIN_HOT isolates the tile effect from the VMEM-cap coupling (a
    # smaller tile frees VMEM, raising the auto hot-tier cap)
    pin_hot = int(os.environ.get("PIN_HOT", "0"))
    kwargs = {"hot_tokens": pin_hot} if pin_hot else {}

    default = ell_score.SLOT_TILE
    try:
        for tile in tiles:
            ell_score.SLOT_TILE = tile
            eng = sparse_mod.SparseEngine.from_scored_index(
                index, max_buckets=4, **kwargs)
            widths = [b["tokT"].shape[0] for b in eng.buckets if "tokT" in b]
            line = f"[tile] SLOT_TILE={tile} widths={widths} hot_h={eng.hot_h}"
            for k in (1000, 100):
                ms = measure_device_step_ms(eng, queries, k)
                line += f" k={k}:{ms:.1f}ms"
            dd, _ = eng.search(queries[:64], top_k=100)
            rec = recall_at_k(np.asarray(dd), od)
            line += f" recall@100={rec:.4f}"
            print(line, flush=True)
            assert rec >= 0.999, rec
            del eng
    finally:
        ell_score.SLOT_TILE = default
    print("[tile] OK", flush=True)


if __name__ == "__main__":
    main()

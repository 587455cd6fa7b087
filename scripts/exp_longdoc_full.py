#!/usr/bin/env python3
"""Wikipedia-class long-document corpus at MS MARCO-class postings volume.

exp_longdoc_scale.py characterized the slot-tiled kernels at 131K docs /
120M tokens; this is the full-scale version of the BASELINE Wikipedia
config class on one chip: ~524K docs with a 20% article-length mixture
(~480M tokens, ~2e8 unique (doc,term) postings — the same nnz class as
the 8.84M-doc MS MARCO run, concentrated in far wider ELL buckets).
Everything is cost-model-driven (choose_layout, auto hot tier); records
layout, memory, device-step time at k=100/1000, and oracle parity.
"""

import os
import time

import numpy as np


def main():
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bm25_tpu.bench.query_bench import (
        _zipf_probs, measure_device_step_ms, recall_at_k)
    from bm25_tpu.eval import index_memory_stats
    from bm25_tpu.models.sparse import SparseEngine, choose_layout
    from bm25_tpu.ops.ell_score import SLOT_TILE
    from bm25_tpu.reference import ReferenceEngine
    from bm25_tpu.scoring import build_scored_index_flat

    num_docs, vocab = 524_288, 65_536
    rng = np.random.default_rng(7)
    cum = np.cumsum(_zipf_probs(vocab))

    is_long = rng.random(num_docs) < 0.2
    lengths = np.where(
        is_long,
        np.maximum(1500, rng.poisson(4000, num_docs)),
        np.maximum(8, rng.poisson(150, num_docs)),
    ).astype(np.int32)
    total = int(lengths.sum())
    print(f"[ldf] {num_docs} docs, {total} tokens "
          f"(mean len {lengths.mean():.0f}, max {lengths.max()})", flush=True)

    t0 = time.perf_counter()
    # draw in chunks: one rng.random(total) would be a 3.9 GB f64 transient
    flat = np.empty(total, dtype=np.int32)
    pos = 0
    while pos < total:
        n = min(50_000_000, total - pos)
        flat[pos:pos + n] = np.searchsorted(cum, rng.random(n))
        pos += n
    np.clip(flat, 0, vocab - 1, out=flat)
    index = build_scored_index_flat(flat, lengths, vocab_size=vocab)
    del flat
    print(f"[ldf] built in {time.perf_counter()-t0:.0f}s nnz={index.nnz}",
          flush=True)

    t0 = time.perf_counter()
    layout = choose_layout(index, k=1000, log=print)
    print(f"[ldf] layout = {layout} ({time.perf_counter()-t0:.0f}s)",
          flush=True)

    t0 = time.perf_counter()
    eng = SparseEngine.from_scored_index(
        index, max_buckets=layout["max_buckets"])
    widths = [b["tokT"].shape[0] for b in eng.buckets if "tokT" in b]
    rows = [b["doc_ids"].shape[0] for b in eng.buckets]
    print(f"[ldf] engine up in {time.perf_counter()-t0:.0f}s "
          f"hot_h={eng.hot_h} widths={widths} rows={rows} "
          f"SLOT_TILE={SLOT_TILE} "
          f"score_budget={eng.score_buffer_budget/2**30:.2f}GiB", flush=True)
    assert max(widths) > SLOT_TILE, "corpus failed to engage slot tiling"
    mem = index_memory_stats(index, eng)
    print(f"[ldf] memory: {mem.as_dict()}", flush=True)

    qrng = np.random.default_rng(11)
    queries = np.clip(
        np.searchsorted(cum, qrng.random((2048, 8))), 0, vocab - 1
    ).astype(np.int32)

    for k in (100, 1000):
        eng.search(queries[:512], top_k=k)  # warm/compile
        t0 = time.perf_counter()
        eng.search(queries, top_k=k)
        dt = time.perf_counter() - t0
        step = measure_device_step_ms(eng, queries, k)
        hw_qps = 512e3 / step if step else float("nan")
        print(f"[ldf] k={k}: e2e {len(queries)/dt:.0f} qps "
              f"({dt*1e3/(len(queries)/512):.0f} ms/512-batch); "
              f"device step {step:.0f} ms/512 -> {hw_qps:.0f} qps "
              f"hardware-side", flush=True)

    ref = ReferenceEngine.from_scored_index(index)
    nb = 16
    rd, rs = ref.search(queries[:nb], top_k=1000)
    dd, ss = eng.search(queries[:nb], top_k=1000)
    rec = recall_at_k(np.asarray(dd), rd)
    err = float(np.max(np.abs(np.asarray(ss) - rs)))
    print(f"[ldf] oracle parity: recall@1000={rec:.4f} max_err={err:.2e}",
          flush=True)
    assert rec >= 0.999, rec
    print("[ldf] OK", flush=True)


if __name__ == "__main__":
    main()

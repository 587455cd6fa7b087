"""Query-throughput benchmark: TPU engine vs the scipy CSC baseline.

The reference ships benchmark machinery but no recorded numbers
(``/root/reference/benchmarks.mojo``, BASELINE.md); the baseline here is the
reference's own algorithm (CSC column-gather scoring + argpartition top-k,
``/root/reference/bm25_native.py:129-158``) measured on this host, and the
headline metric is batched queries/sec through the TPU engine at the same
semantics (results cross-checked for recall parity during the run).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np


@dataclass
class BenchConfig:
    num_docs: int = 524288
    vocab: int = 32768
    avg_len: int = 48
    num_queries: int = 2048
    batch: int = 512
    query_len: int = 8
    top_k: int = 100
    baseline_queries: int = 32
    seed: int = 0
    engine: str = "auto"

    @classmethod
    def from_env(cls) -> "BenchConfig":
        kw = {}
        for f, spec in cls.__dataclass_fields__.items():
            v = os.environ.get(f"BM25_BENCH_{f.upper()}")
            if v is not None:
                kw[f] = v if f == "engine" else int(v)
        return cls(**kw)


def _zipf_probs(vocab: int) -> np.ndarray:
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = 1.0 / ranks
    return p / p.sum()


def make_synthetic_index(cfg: BenchConfig):
    from bm25_tpu.scoring import build_scored_index_flat

    rng = np.random.default_rng(cfg.seed)
    probs = _zipf_probs(cfg.vocab)
    cum = np.cumsum(probs)
    lengths = np.maximum(4, rng.poisson(cfg.avg_len, cfg.num_docs)).astype(np.int32)
    # inverse-CDF sampling (much faster than rng.choice with p at 10M+ draws)
    flat = np.searchsorted(cum, rng.random(int(lengths.sum()))).astype(np.int32)
    np.clip(flat, 0, cfg.vocab - 1, out=flat)
    return build_scored_index_flat(flat, lengths, vocab_size=cfg.vocab)


def make_queries(cfg: BenchConfig) -> np.ndarray:
    rng = np.random.default_rng(cfg.seed + 1)
    cum = np.cumsum(_zipf_probs(cfg.vocab))
    q = np.searchsorted(cum, rng.random((cfg.num_queries, cfg.query_len)))
    return np.clip(q, 0, cfg.vocab - 1).astype(np.int32)


def recall_at_k(got_docs: np.ndarray, want_docs: np.ndarray) -> float:
    hits = 0
    for g, w in zip(got_docs, want_docs):
        hits += len(set(g.tolist()) & set(w.tolist()))
    return hits / want_docs.size


def run(cfg: BenchConfig | None = None, log=print) -> dict:
    cfg = cfg or BenchConfig.from_env()
    log(f"[bench] building synthetic index: {cfg.num_docs} docs, vocab {cfg.vocab}")
    t0 = time.perf_counter()
    index = make_synthetic_index(cfg)
    build_s = time.perf_counter() - t0
    log(f"[bench] built in {build_s:.1f}s (nnz={index.nnz})")
    queries = make_queries(cfg)
    k = min(cfg.top_k, cfg.num_docs)

    # --- baseline: reference CSC engine on host -----------------------------
    from bm25_tpu.reference import ReferenceEngine

    ref = ReferenceEngine.from_scored_index(index)
    nb = min(cfg.baseline_queries, len(queries))
    t0 = time.perf_counter()
    ref_docs, ref_scores = ref.search(queries[:nb], top_k=k)
    baseline_qps = nb / (time.perf_counter() - t0)
    log(f"[bench] baseline (scipy CSC): {baseline_qps:.1f} qps")

    # --- TPU engine ----------------------------------------------------------
    from bm25_tpu.models.auto import create_engine

    t0 = time.perf_counter()
    engine = create_engine(index, mode=cfg.engine)
    upload_s = time.perf_counter() - t0
    log(f"[bench] engine={type(engine).__name__} upload+init {upload_s:.1f}s")

    batches = [
        queries[i : i + cfg.batch] for i in range(0, len(queries), cfg.batch)
    ]
    # warmup / compile
    docs0, scores0 = engine.search(batches[0], top_k=k)
    # per-batch latency (each call blocks on its own results)
    lat = []
    for b in batches:
        t0 = time.perf_counter()
        engine.search(b, top_k=k)
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50))
    p99 = float(np.percentile(lat, 99))
    # sustained throughput: all batches dispatched through one pipelined
    # call (device compute overlaps host<->device transfers)
    search_all = getattr(engine, "search_pipelined", None)
    t_all = time.perf_counter()
    if search_all is not None:
        search_all(queries, top_k=k, batch=cfg.batch)
    else:
        engine.search(queries, top_k=k)
    total_s = time.perf_counter() - t_all
    qps = len(queries) / total_s

    # --- parity check vs baseline -------------------------------------------
    from bm25_tpu.eval import index_memory_stats

    mem = index_memory_stats(index, engine)
    recall = recall_at_k(docs0[:nb], ref_docs)
    log(
        f"[bench] qps={qps:.0f} p50_batch={p50*1e3:.1f}ms p99={p99*1e3:.1f}ms "
        f"recall@{k}={recall:.4f} vs_baseline={qps / baseline_qps:.1f}x"
    )

    return {
        "metric": "bm25_query_throughput",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / baseline_qps, 2),
        "extra": {
            "num_docs": cfg.num_docs,
            "vocab": cfg.vocab,
            "top_k": k,
            "batch": cfg.batch,
            "p50_batch_ms": round(p50 * 1e3, 2),
            "p99_batch_ms": round(p99 * 1e3, 2),
            "recall_vs_reference": round(recall, 4),
            "baseline_qps": round(baseline_qps, 1),
            "index_build_docs_per_sec": round(cfg.num_docs / build_s, 1),
            "engine": type(engine).__name__,
            "hot_tokens": getattr(engine, "hot_h", 0),
            "index_memory": mem.as_dict(),
        },
    }

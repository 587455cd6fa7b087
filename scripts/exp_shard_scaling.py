"""Round-5 item 6: empirical shard-scaling curve on the simulated CPU mesh.

The distributed generalization of the reference's two-stage GPU top-k
(``/root/reference/operations/topk.mojo:576-830``) — per-shard local
top-k + all-gather + replicated merge — has never been timed on real
multi-chip ICI.  This pre-commits a falsifiable prediction for the first
real multi-chip session: strong- and weak-scaling of the sharded step at
S in {1, 2, 4, 8}, with the merge share of each step measured (full step
vs a ``local_only`` cut of the SAME compiled plan) next to the finding-7
model's prediction (merge cost ~ linear in S*k: all-gather volume
S*k*Q*8 B + a replicated two-key sort of width S*k).

The model is calibrated at the smallest multi-shard point (S=2) and
predicts S=4/8; measured-vs-predicted lands in NOTES.md and a compact
version runs inside the driver bench (``shard_scaling`` extra row).

Run: python scripts/exp_shard_scaling.py [--json-only] [--quick]
(CPU-only; sets the platform in-process like tests/conftest.py.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_zipf_index(num_docs: int, vocab: int, avg_len: int, seed: int):
    from bm25_tpu.scoring import build_scored_index_flat

    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    cum = np.cumsum(probs)
    lengths = np.maximum(4, rng.poisson(avg_len, num_docs)).astype(np.int32)
    flat = np.searchsorted(cum, rng.random(int(lengths.sum()))).astype(np.int32)
    np.clip(flat, 0, vocab - 1, out=flat)
    return build_scored_index_flat(flat, lengths, vocab_size=vocab)


def make_queries(vocab: int, n: int, t: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    q = rng.choice(vocab, size=(n, t), p=probs).astype(np.int32)
    q[rng.random((n, t)) < 0.15] = -1
    return q


def measure_point(idx, n_shards: int, queries: np.ndarray, k: int,
                  check_queries: int = 16, reps: int = 5) -> dict:
    """One (S, corpus) point: full + local_only step ms, merge share,
    recall spot-check vs the host oracle."""
    import jax

    from bm25_tpu.eval import recall_at_k
    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.reference import ReferenceEngine

    mesh = make_mesh(n_shards)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh)
    k = min(k, idx.num_docs)

    nb = min(check_queries, len(queries))
    docs, _ = eng.search(queries[:nb], top_k=k)
    od, _ = ReferenceEngine.from_scored_index(idx).search(queries[:nb], top_k=k)
    rec = float(recall_at_k(np.asarray(docs), od))

    fn_full, step_args, _n_chunks = eng.bench_step_fn(queries, k)
    _, chunks = eng._plan(queries, None, k)
    _cq, padded, wpadded, cold_padded, _wc = chunks[0]
    fn_local = eng._step_fn(
        k, padded.shape[0], padded.shape[1],
        weighted=wpadded is not None, split=cold_padded is not None,
        t_pad_c=None if cold_padded is None else cold_padded.shape[1],
        ids_only=False, masked=False, local_only=True,
    )

    def timed(fn):
        best = float("inf")
        for _ in range(reps):
            t1 = time.perf_counter()
            jax.block_until_ready(fn(*step_args))
            best = min(best, time.perf_counter() - t1)
        return best

    jax.block_until_ready(fn_full(*step_args))  # compile
    jax.block_until_ready(fn_local(*step_args))
    t_full, t_local = timed(fn_full), timed(fn_local)
    merge_ms = max(0.0, (t_full - t_local) * 1e3)
    return {
        "shards": n_shards,
        "num_docs": idx.num_docs,
        "k": k,
        "recall": round(rec, 4),
        "step_full_ms": round(t_full * 1e3, 2),
        "step_local_ms": round(t_local * 1e3, 2),
        "merge_ms": round(merge_ms, 2),
        "merge_share": round(merge_ms / max(t_full * 1e3, 1e-9), 4),
    }


def add_model_prediction(rows: list[dict]) -> None:
    """Finding-7 model: merge cost ~ linear in S*k (gather volume + sort
    width both scale with S*k).  Calibrated at the largest measured S —
    the most reliable point: at small S the merge sits inside timing
    noise (full-vs-local can even invert when XLA fuses the two step
    variants differently) — predicting the smaller-S rows downward."""
    cal = max((r for r in rows if r["merge_ms"] > 0),
              key=lambda r: r["shards"], default=None)
    if cal is None:
        return
    per_unit = cal["merge_ms"] / max(cal["shards"], 1)
    for r in rows:
        r["merge_ms_model"] = round(per_unit * r["shards"], 2)
        r["model_calibrated_here"] = r is cal


def run_curves(strong_docs: int, weak_per_shard: int, vocab: int,
               avg_len: int, num_queries: int, query_len: int, k: int,
               shards=(1, 2, 4, 8), log=print) -> dict:
    queries = make_queries(vocab, num_queries, query_len, seed=11)

    log(f"[scaling] strong: {strong_docs} docs total, k={k}")
    strong_idx = build_zipf_index(strong_docs, vocab, avg_len, seed=7)
    strong = []
    for s in shards:
        row = measure_point(strong_idx, s, queries, k)
        strong.append(row)
        log(f"[scaling] strong {row}")
    add_model_prediction(strong)

    weak = []
    if weak_per_shard:
        log(f"[scaling] weak: {weak_per_shard} docs/shard")
        for s in shards:
            idx = build_zipf_index(weak_per_shard * s, vocab, avg_len, seed=7)
            row = measure_point(idx, s, queries, k)
            weak.append(row)
            log(f"[scaling] weak {row}")
        add_model_prediction(weak)

    return {
        "k": k, "vocab": vocab, "num_queries": num_queries,
        "strong": strong, "weak": weak,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--strong-docs", type=int, default=262144)
    ap.add_argument("--weak-per-shard", type=int, default=32768,
                    help="0 disables the weak curve")
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--avg-len", type=int, default=48)
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--query-len", type=int, default=8)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.strong_docs, args.weak_per_shard = 16384, 4096
        args.vocab, args.queries, args.k = 8192, 64, 100

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    log = (lambda *a: None) if args.json_only else print
    out = run_curves(args.strong_docs, args.weak_per_shard, args.vocab,
                     args.avg_len, args.queries, args.query_len, args.k,
                     log=log)
    print(json.dumps(out))
    ok = all(r["recall"] == 1.0 for r in out["strong"] + out["weak"])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

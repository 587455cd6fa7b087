"""Round-4 item 3: mid-scale sharded proof on the virtual 8-device mesh.

Every multi-device correctness artifact through round 3 was tiny-shape
(<= 131K docs; dryrun = 40 docs).  Layout/memory bugs surface with scale
(the 20M-doc worker-OOM class), so this runs ShardedSparseEngine at
>= 1M docs — Zipf token draw, 20% long documents — on the simulated
8-device CPU mesh and records, per k:

- recall vs the host oracle (must be 1.0; the merge is exact),
- the full sharded step time vs a ``local_only`` cut of the SAME
  compiled plan (stops after each shard's local top-k), so the ICI
  all-gather + replicated-merge share of the step is a measured
  fraction, not a model,
- per-shard work skew: real (non-pad) postings per shard row-block.
  Slot counts per shard are structurally EQUAL (every shard scans
  rows/8 of each bucket's fixed-width ELL), so skew shows up only as
  pad fraction — reported to prove it, not to hunt it.

Then it runs the jax.distributed multihost worker
(``bm25_tpu/parallel/_multihost_main.py``) as a 4-process x 2-device
and an 8-process x 1-device localhost cluster — the 4-8-process
variant of tests/test_multihost.py the round-3 verdict asked for.

Run: python scripts/exp_r4_sharded_midscale.py [--docs N] [--quick]
(CPU-only; sets the platform in-process like tests/conftest.py.)
"""

from __future__ import annotations

import argparse
import json
import socket
import subprocess
import sys
import time

import numpy as np


def build_midscale_index(num_docs: int, vocab: int, long_pct: int,
                         short_len: int, long_len: int, seed: int):
    """Zipf-token corpus with a long-document mix, as a ScoredIndex."""
    from bm25_tpu.scoring import build_scored_index_flat

    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    cum = np.cumsum(probs)
    is_long = rng.random(num_docs) < long_pct / 100.0
    lengths = np.where(
        is_long, rng.poisson(long_len, num_docs), rng.poisson(short_len, num_docs)
    )
    lengths = np.maximum(4, lengths).astype(np.int64)
    total = int(lengths.sum())
    # inverse-CDF sampling in slabs (one 300M-draw temp would be fine in
    # RAM, but slabs keep peak memory flat)
    flat = np.empty(total, dtype=np.int32)
    pos = 0
    slab = 50_000_000
    while pos < total:
        n = min(slab, total - pos)
        flat[pos : pos + n] = np.searchsorted(cum, rng.random(n)).astype(np.int32)
        pos += n
    np.clip(flat, 0, vocab - 1, out=flat)
    return build_scored_index_flat(flat, lengths.astype(np.int32),
                                   vocab_size=vocab)


def make_queries(vocab: int, n: int, t: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    q = rng.choice(vocab, size=(n, t), p=probs).astype(np.int32)
    q[rng.random((n, t)) < 0.15] = -1  # pad/OOV mix
    return q


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_multihost(nproc: int, dev_per_proc: int, timeout: int = 600) -> dict:
    port = _free_port()
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "bm25_tpu.parallel._multihost_main",
             str(pid), str(nproc), str(port), str(dev_per_proc)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    ok = (procs[0].returncode == 0 and "MULTIHOST_OK" in outs[0]
          and all(p.returncode == 0 for p in procs))
    if not ok:
        print(f"[midscale] multihost {nproc}x{dev_per_proc} FAILED:\n"
              f"{outs[0][-2000:]}", flush=True)
    return {"nproc": nproc, "devices_per_proc": dev_per_proc, "ok": ok,
            "wall_s": round(time.perf_counter() - t0, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_048_576)
    ap.add_argument("--vocab", type=int, default=65536)
    ap.add_argument("--long-pct", type=int, default=20)
    ap.add_argument("--short-len", type=int, default=60)
    ap.add_argument("--long-len", type=int, default=1200)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--query-len", type=int, default=8)
    ap.add_argument("--ks", type=int, nargs="+", default=[100, 1000])
    ap.add_argument("--overhead-target", type=float, default=3.0)
    ap.add_argument("--skip-multihost", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="50K-doc smoke of the same code paths")
    args = ap.parse_args()
    if args.quick:
        args.docs, args.vocab, args.long_len = 50_000, 8192, 400
        args.ks = [50]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.reference import ReferenceEngine

    t0 = time.perf_counter()
    idx = build_midscale_index(args.docs, args.vocab, args.long_pct,
                               args.short_len, args.long_len, seed=7)
    print(f"[midscale] index: {idx.num_docs} docs nnz={idx.nnz} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    mesh = make_mesh(8)  # 8-way doc sharding
    t0 = time.perf_counter()
    eng = ShardedSparseEngine.from_scored_index(
        idx, mesh=mesh, overhead_target=args.overhead_target
    )
    print(f"[midscale] engine up in {time.perf_counter()-t0:.0f}s "
          f"hot_h={eng.hot_h} buckets={len(eng.buckets)}", flush=True)

    # per-shard work skew: real postings per row-block of the sharded axis
    shard_nnz = np.zeros(8, dtype=np.int64)
    shard_slots = np.zeros(8, dtype=np.int64)
    for b in eng.buckets:
        val = np.asarray(b["valT"]) if "valT" in b else None
        if val is None:
            continue
        rows_axis = 1 if val.shape[1] >= val.shape[0] else 0
        rows = val.shape[rows_axis]
        per = rows // 8
        for s in range(8):
            sl = [slice(None)] * val.ndim
            sl[rows_axis] = slice(s * per, (s + 1) * per)
            blk = val[tuple(sl)]
            shard_nnz[s] += int(np.count_nonzero(blk))
            shard_slots[s] += blk.size
    skew = float(shard_nnz.max() / max(shard_nnz.mean(), 1))
    print(f"[midscale] per-shard nnz: {shard_nnz.tolist()} "
          f"(max/mean {skew:.3f}); slots equal: "
          f"{bool((shard_slots == shard_slots[0]).all())}", flush=True)

    oracle = ReferenceEngine.from_scored_index(idx)
    queries = make_queries(args.vocab, args.queries, args.query_len, seed=11)

    from bm25_tpu.eval import recall_at_k

    rows = []
    for k in args.ks:
        t0 = time.perf_counter()
        docs, scores = eng.search(queries, top_k=k)
        first_s = time.perf_counter() - t0
        od, os_ = oracle.search(queries, top_k=k)
        rec = recall_at_k(np.asarray(docs), od)
        np.testing.assert_allclose(scores, os_, rtol=1e-5, atol=1e-6)

        # full vs local_only step on the SAME compiled plan (chunk 0)
        fn_full, step_args, n_chunks = eng.bench_step_fn(queries, k)
        _, chunks = eng._plan(queries, None, k)
        _cq, padded, wpadded, cold_padded, _wc = chunks[0]
        fn_local = eng._step_fn(
            k, padded.shape[0], padded.shape[1],
            weighted=wpadded is not None, split=cold_padded is not None,
            t_pad_c=None if cold_padded is None else cold_padded.shape[1],
            ids_only=False, masked=False, local_only=True,
        )

        def timed(fn, n=3):
            best = float("inf")
            for _ in range(n):
                t1 = time.perf_counter()
                jax.block_until_ready(fn(*step_args))
                best = min(best, time.perf_counter() - t1)
            return best

        jax.block_until_ready(fn_full(*step_args))   # compile
        jax.block_until_ready(fn_local(*step_args))
        t_full, t_local = timed(fn_full), timed(fn_local)
        merge_share = max(0.0, 1.0 - t_local / t_full)
        row = {
            "k": k, "recall": round(float(rec), 4),
            "first_search_s": round(first_s, 1),
            "step_full_ms": round(t_full * 1e3, 1),
            "step_local_ms": round(t_local * 1e3, 1),
            "merge_share": round(merge_share, 4),
            "n_chunks": n_chunks,
        }
        rows.append(row)
        print(f"[midscale] {row}", flush=True)

    multihost = []
    if not args.skip_multihost:
        for nproc, dpp in ((4, 2), (8, 1)):
            multihost.append(run_multihost(nproc, dpp))
            print(f"[midscale] multihost {multihost[-1]}", flush=True)

    out = {
        "num_docs": idx.num_docs, "nnz": int(idx.nnz),
        "vocab": args.vocab, "long_pct": args.long_pct,
        "hot_h": eng.hot_h, "buckets": len(eng.buckets),
        "shard_nnz": shard_nnz.tolist(),
        "shard_nnz_skew_max_over_mean": round(skew, 4),
        "shard_slots_equal": bool((shard_slots == shard_slots[0]).all()),
        "rows": rows, "multihost": multihost,
    }
    print(json.dumps(out))
    ok = (all(r["recall"] == 1.0 for r in rows)
          and all(m["ok"] for m in multihost))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

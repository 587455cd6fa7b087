#!/usr/bin/env python3
"""Time-boxed randomized fuzz campaign: every engine family vs the oracle.

Extends tests/test_fuzz.py's fixed-seed cases to a continuous random sweep
over corpus shapes, scoring methods, engine configurations, and query
features (padding, OOV, duplicates, weights, doc masks, ids-only) — the
soak analog of the reference's seeded golden tests
(/root/reference/test_topk.mojo:146).  Any divergence from the host oracle
is a real bug; the script prints each failure's full reproduction recipe
and exits nonzero.

Run on the simulated CPU mesh (this is a semantics campaign, not a perf
one):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/exp_fuzz_campaign.py --minutes 30
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def make_engine(rng, idx, mesh_cache):
    """Pick a random engine family + configuration for this round."""
    from bm25_tpu.models.dense import DenseEngine
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.parallel.sharded_engine import (ShardedEngine,
                                                  ShardedSparseEngine)

    fam = rng.choice(["dense", "sparse", "sharded", "sharded_sparse"])
    if fam == "dense":
        return "dense", DenseEngine.from_scored_index(idx)
    if fam == "sparse":
        # random tiering: hot tier size and tail threshold both fuzzed so
        # hot-only / hot+tail / 3-tier splits all come up
        kwargs = {}
        if rng.random() < 0.7:
            kwargs["hot_tokens"] = int(rng.integers(0, 32))
        if rng.random() < 0.5:
            kwargs["tail_cap"] = int(rng.integers(2, 64))
        return f"sparse{kwargs}", SparseEngine.from_scored_index(idx, **kwargs)
    n_shards = int(rng.choice([2, 4, 8]))
    mesh = mesh_cache.get(n_shards)
    if mesh is None:
        from bm25_tpu.parallel.mesh import make_mesh

        data = 2 if (n_shards <= 4 and len(os.sched_getaffinity(0)) > 1) else 1
        mesh = make_mesh(n_shards, data=data)
        mesh_cache[n_shards] = mesh
    cls = ShardedEngine if fam == "sharded" else ShardedSparseEngine
    return f"{fam}x{n_shards}", cls.from_scored_index(idx, mesh=mesh)


def one_round(seed: int, mesh_cache: dict) -> dict:
    from conftest import make_zipf_corpus, strict_positions

    if seed % 7 == 3:
        # every 7th round: the updatable add/delete/compact/search state
        # machine instead of a static-engine round (reuses the pytest
        # fuzzer's model checker with a fresh random seed — arbitrary op
        # interleavings against the id/text/tombstone bookkeeping)
        from test_fuzz import test_updatable_retriever_state_machine_fuzz

        test_updatable_retriever_state_machine_fuzz(seed)
        return {"engine": "updatable-state-machine", "seed": seed}

    from bm25_tpu.reference import ReferenceEngine
    from bm25_tpu.scoring import BM25Params, build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    rng = np.random.default_rng(seed)
    num_docs = int(rng.integers(20, 1200))
    vocab_hint = int(rng.integers(50, 3000))
    avg_len = int(rng.integers(3, 80))
    method = str(rng.choice(
        ["lucene", "classic", "robertson", "atire", "bm25l", "bm25+"]
    ))
    corpus = make_zipf_corpus(num_docs, vocab=vocab_hint, avg_len=avg_len,
                              seed=seed)
    tok = Tokenizer(stopwords=None, stemmer=None)
    out = tok.tokenize_corpus(corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab),
                             params=BM25Params(method=method))
    oracle = ReferenceEngine.from_scored_index(idx)
    name, engine = make_engine(rng, idx, mesh_cache)

    q_rows = int(rng.integers(1, 24))
    q_width = int(rng.integers(1, 24))
    queries = rng.integers(-1, idx.vocab_size, size=(q_rows, q_width),
                           dtype=np.int32)
    if rng.random() < 0.3:
        queries[0] = -1  # fully padded row
    if rng.random() < 0.3 and q_width >= 3:
        queries[:, 1] = queries[:, 0]  # duplicates (dedup path)
    k = int(rng.integers(1, num_docs + 4))

    weights = None
    if rng.random() < 0.35:
        weights = rng.uniform(0.0, 4.0,
                              size=queries.shape).astype(np.float32)
    doc_mask = None
    if rng.random() < 0.35:
        density = float(rng.choice([0.02, 0.2, 0.7, 1.0]))
        doc_mask = rng.random(num_docs) < density
        if not doc_mask.any():
            doc_mask[int(rng.integers(0, num_docs))] = True

    kwargs = {}
    if weights is not None:
        kwargs["weights"] = weights
    if doc_mask is not None:
        kwargs["doc_mask"] = doc_mask
    dd, ds = engine.search(queries, top_k=k, **kwargs)
    od, os_ = oracle.search(queries, top_k=k, **kwargs)
    # tolerance scales with the row's summand magnitude, not the result:
    # robertson+weights cancels +-35-scale contributions down to ~0.1
    # results, where f32 accumulation noise is ~1e-4 ABSOLUTE (triaged
    # seeds 2270/2297: every violation was cancellation, no bug) — an
    # rtol on the cancelled result would cry wolf forever
    row_scale = np.maximum(1.0, np.abs(os_).max(axis=1, keepdims=True))
    diff = np.abs(ds - os_)
    assert (diff <= 2e-5 * row_scale + 5e-5 * np.abs(os_)).all(), (
        f"score divergence beyond accumulation noise: "
        f"max {diff.max():.3e} at row scale {row_scale.max():.1f}"
    )
    # exact-tie positions are excluded by strict_positions; ALSO exclude
    # near-ties (gap < f32 accumulation noise): different summation
    # orders legitimately swap adjacent docs whose oracle scores differ
    # by ~1e-5 (triaged seeds 2025/2144/2278 — every mismatch was an
    # adjacent swap with gap 6e-6..1.4e-5).  Real selection bugs produce
    # misorderings across LARGE gaps and stay caught.
    strict = strict_positions(os_)
    gap_eps = 1e-5 * row_scale
    near_prev = np.zeros_like(strict)
    near_next = np.zeros_like(strict)
    near_prev[:, 1:] = (os_[:, :-1] - os_[:, 1:]) < gap_eps
    near_next[:, :-1] = (os_[:, :-1] - os_[:, 1:]) < gap_eps
    strict &= ~(near_prev | near_next)
    np.testing.assert_array_equal(dd[strict], od[strict])
    # shortfall sentinels must agree exactly (masked search, k > eligible)
    np.testing.assert_array_equal(dd < 0, od < 0)

    if doc_mask is None and weights is None and rng.random() < 0.3:
        ids_only = getattr(engine, "search_ids", None)
        if ids_only is not None:
            np.testing.assert_array_equal(ids_only(queries, top_k=k), dd)
    return {"engine": name, "method": method, "docs": num_docs,
            "vocab": idx.vocab_size, "k": k,
            "weighted": weights is not None, "masked": doc_mask is not None}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--seed0", type=int, default=0)
    ap.add_argument("--max-failures", type=int, default=5)
    ap.add_argument("--seeds", type=str, default=None,
                    help="comma-separated specific seeds to re-run first "
                         "(triage mode)")
    args = ap.parse_args()

    deadline = time.monotonic() + args.minutes * 60
    mesh_cache: dict = {}
    rounds = 0
    failures = []
    if args.seeds:
        for s in (int(x) for x in args.seeds.split(",")):
            try:
                one_round(s, mesh_cache)
                rounds += 1
                print(f"[fuzz] seed {s} clean", flush=True)
            except Exception:
                failures.append({"seed": s,
                                 "trace": traceback.format_exc()[-2000:]})
                print(f"[fuzz] seed {s} FAILED\n{traceback.format_exc()}",
                      flush=True)
    seed = args.seed0
    while time.monotonic() < deadline and len(failures) < args.max_failures:
        try:
            info = one_round(seed, mesh_cache)
            rounds += 1
            if rounds % 25 == 0:
                print(f"[fuzz] {rounds} rounds clean "
                      f"(last: {info})", flush=True)
            if rounds % 200 == 0:
                # every round jits fresh shapes; ~1700 rounds of
                # accumulated executables exhausted the in-process LLVM
                # code allocator (SIGSEGV after 'Cannot allocate memory'
                # with 126 GB host RAM free) — bound the cache lifetime
                import jax

                jax.clear_caches()
        except AssertionError:
            failures.append({"seed": seed,
                             "trace": traceback.format_exc()[-2000:]})
            print(f"[fuzz] FAILURE at seed={seed}\n{traceback.format_exc()}",
                  flush=True)
        except Exception:
            failures.append({"seed": seed, "kind": "crash",
                             "trace": traceback.format_exc()[-2000:]})
            print(f"[fuzz] CRASH at seed={seed}\n{traceback.format_exc()}",
                  flush=True)
        seed += 1
    print(json.dumps({"rounds": rounds, "failures": failures,
                      "minutes": args.minutes}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

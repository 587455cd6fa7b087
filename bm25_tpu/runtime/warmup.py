"""Compile-cache warmers: pre-compile a serving engine's shape family.

The first dispatch of each distinct compiled shape — (chunk height, query
width, cold width, top_k, weighted-or-not) — pays a fresh XLA compile,
which costs minutes through a remote-compile relay (NOTES.md: a cold
serving soak spent 19 minutes compiling before taking traffic; the
``--warmup-top-k`` flag only covers ONE shape).  Compiles land in the
persistent compilation cache (``runtime/session.py``), so warming is a
*deploy* step: run ``bm25-tpu warm`` once per engine configuration and
every later ``serve`` start or ``/reload`` replays the cached binaries.

``warm_engine`` drives the REAL public dispatch path (``engine.search``)
rather than poking jit internals, so exactly the shapes the planner
(``models/sparse.py::plan_query_dispatch``) would compile under traffic
are the ones compiled here.  The reference has no serving daemon and no
compile step to warm (SURVEY.md section 0); this is the TPU-native
operational answer to XLA's trace-once/compile-once model.
"""

from __future__ import annotations

import time

import numpy as np


def _query_matrix(
    engine, q: int, t: int, cold: int | None, rng: np.random.Generator
) -> np.ndarray:
    """A (q, t) int32 query matrix shaped to hit one compiled shape class.

    ``cold`` pins each row's count of cold (non-hot-tier) tokens so the
    routed planner compiles chunks at that cold-width class.  When the
    engine has no hot table (dense engines, routing off) the ids are
    plain uniform draws and ``cold`` is ignored.
    """
    vocab = int(engine.vocab_size)
    table = getattr(engine, "hot_table_host", None)
    if cold is None or table is None:
        return rng.integers(0, vocab, size=(q, t), dtype=np.int32)
    cold = min(cold, t)
    # the hot table is padded past the real vocab; ids must stay in range
    table = np.asarray(table)[:vocab]
    cold_pool = np.where(table < 0)[0]
    hot_pool = np.where(table >= 0)[0]
    if len(cold_pool) == 0 or len(hot_pool) == 0:
        # degenerate hot split (all-hot or all-cold vocab): routing can't
        # produce mixed widths anyway, fall back to uniform ids
        return rng.integers(0, vocab, size=(q, t), dtype=np.int32)
    ids = np.empty((q, t), dtype=np.int64)
    ids[:, :cold] = rng.choice(cold_pool, size=(q, cold))
    ids[:, cold:] = rng.choice(hot_pool, size=(q, t - cold))
    return ids.astype(np.int32)


def default_plan(
    engine,
    top_ks=(10,),
    batch_sizes=(1, 8, 32),
    routed_batch: int = 512,
    widths=(8,),
    cold_classes=(2, 4, 8),
    weighted: bool = False,
    ids_only: bool = False,
    filtered: bool = False,
) -> list[dict]:
    """Enumerate the warm tasks for a serving deployment.

    Every batch size is warmed in the form production would run it:
    sizes below the engine's ``route_min_queries`` floor warm as plain
    *unrouted* dispatches (each pads to its own 8-row multiple — the
    shapes a lightly-loaded server compiles request by request); sizes
    at or above the floor warm *routed*, once per cold-width class, so
    the dispatch DP emits chunks compiled at exactly the classes a busy
    micro-batched server hits.  ``routed_batch`` is just an extra large
    size appended to ``batch_sizes``.  Engines without a hot tier warm
    every size unrouted (routing never engages for them).

    ``weighted=True`` / ``ids_only=True`` / ``filtered=True`` add those
    path variants (each is its own compiled family; ``filtered`` covers
    ``doc_mask`` / HTTP ``filter_ids`` requests, which bypass the
    micro-batcher and would otherwise pay their cold compile on the
    first production request).  Returns plain dicts so callers (CLI,
    tests) can inspect or edit the plan before running it.
    """
    route_min = int(getattr(engine, "route_min_queries", 32) or 32)
    has_routing = (
        getattr(engine, "hot_table_host", None) is not None
        and int(getattr(engine, "hot_h", 0) or 0) > 0
    )
    sizes = sorted(set(batch_sizes) | {routed_batch})
    tasks: list[dict] = []

    def add(q, t, c, k, w, io, f=False):
        tasks.append({
            "q": int(q), "t": int(t), "cold": c, "top_k": int(k),
            "weighted": bool(w), "ids_only": bool(io), "filtered": bool(f),
        })

    variants = [(False, False, False)]
    if weighted:
        variants.append((True, False, False))
    if ids_only and getattr(engine, "search_ids", None) is not None:
        variants.append((False, True, False))
    if filtered:
        variants.append((False, False, True))
    for k in top_ks:
        for t in widths:
            for w, io, f in variants:
                for q in sizes:
                    if has_routing and q >= route_min:
                        for c in cold_classes:
                            if c <= t:
                                add(q, t, int(c), k, w, io, f)
                    else:
                        add(q, t, None, k, w, io, f)
    return tasks


def warm_engine(
    engine,
    tasks: list[dict] | None = None,
    *,
    seed: int = 0,
    log=None,
    **plan_kwargs,
) -> list[dict]:
    """Run every task through ``engine.search``, timing each dispatch.

    Returns the task list with a ``seconds`` field added per task.  Cache
    hits run in milliseconds-to-tens-of-ms; a multi-second entry is a
    fresh compile that is now persistently cached.  Safe to re-run —
    idempotent by construction (results are discarded).
    """
    if tasks is None:
        tasks = default_plan(engine, **plan_kwargs)
    rng = np.random.default_rng(seed)
    report = []
    for task in tasks:
        ids = _query_matrix(engine, task["q"], task["t"], task["cold"], rng)
        weights = None
        if task["weighted"]:
            # unit weights: tail-tier engines require non-negative weights
            weights = np.ones_like(ids, dtype=np.float32)
        kw = {}
        if task.get("filtered"):
            # any mask hits the same compiled shape; half density keeps
            # the selection inputs realistic
            kw["doc_mask"] = (
                np.arange(int(engine.num_docs)) % 2 == 0
            )
        t0 = time.monotonic()
        if task["ids_only"]:
            engine.search_ids(ids, top_k=task["top_k"], weights=weights,
                              **kw)
        elif weights is not None:
            engine.search(ids, top_k=task["top_k"], weights=weights, **kw)
        else:
            engine.search(ids, top_k=task["top_k"], **kw)
        entry = dict(task, seconds=round(time.monotonic() - t0, 3))
        report.append(entry)
        if log is not None:
            c = "-" if entry["cold"] is None else entry["cold"]
            flags = "".join(
                f" {name}" for name, on in
                (("weighted", entry["weighted"]),
                 ("ids_only", entry["ids_only"]),
                 ("filtered", entry.get("filtered", False)))
                if on
            )
            log(
                f"warm q={entry['q']:>4} t={entry['t']:>3} cold={c:>2} "
                f"k={entry['top_k']:>5}{flags}: {entry['seconds']:.3f}s"
            )
    return report

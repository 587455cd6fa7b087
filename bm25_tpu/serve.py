"""HTTP serving daemon for a loaded BM25 index.

The reference is script-only (no server — SURVEY.md section 0); production
deployment needs a long-lived process with the index resident on device.
Stdlib-only JSON-over-HTTP:

    POST /search   {"queries": ["text", ...], "top_k": 10}
                -> {"results": [[{"doc": id, "score": s, "text": ...}]]}
                   a query may also be a {"term": weight, ...} object —
                   weighted retrieval (query expansion), scored on device;
                   "include_scores": false returns rankings only (skips
                   the device->host score transfer where supported)
    GET  /healthz  -> {"status": "ok", "num_docs": N, ...}

Batched: each request's queries run as one device batch.  With
``batch_window_ms > 0`` a :class:`MicroBatcher` additionally coalesces
queries from *concurrent* requests that arrive within the window into one
device dispatch (admission control), so many small clients share the
throughput of one large batch instead of serializing per-request launches.
Start with ``bm25-tpu serve <index_dir>`` or ``Server(...).serve_forever()``.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class ServerMetrics:
    """Thread-safe request/latency/batch-occupancy counters for /healthz.

    Latency percentiles are computed over a sliding window of the most
    recent requests (default 4096) so long-running servers report current
    behavior, not lifetime averages.
    """

    def __init__(self, window: int = 4096):
        self._lock = threading.Lock()
        self.requests = 0
        self.queries = 0
        self.errors = 0
        self._lat = deque(maxlen=window)

    def record(self, n_queries: int, seconds: float) -> None:
        with self._lock:
            self.requests += 1
            self.queries += n_queries
            self._lat.append(seconds)

    def record_error(self) -> None:
        with self._lock:
            self.errors += 1

    def snapshot(self, batcher=None) -> dict:
        with self._lock:
            lat = list(self._lat)
            out = {
                "requests": self.requests,
                "queries": self.queries,
                "errors": self.errors,
            }
        if lat:
            arr = np.asarray(lat)
            out["latency_ms"] = {
                "p50": round(float(np.percentile(arr, 50)) * 1e3, 2),
                "p90": round(float(np.percentile(arr, 90)) * 1e3, 2),
                "p99": round(float(np.percentile(arr, 99)) * 1e3, 2),
            }
        if batcher is not None:
            out["batches_run"] = batcher.batches_run
            out["batch_occupancy"] = round(
                batcher.rows_run / max(batcher.batches_run, 1), 2
            )
        return out


class MicroBatcher:
    """Cross-request micro-batching for a shared device engine.

    ``search()`` blocks the calling (request handler) thread; a single
    collector thread drains the queue, waits up to ``window_ms`` after the
    first arrival for companions (or until ``max_rows`` queries are
    pending), groups by ``top_k``, pads query matrices to a common width
    and runs ONE ``engine.search`` per group.  An idle server keeps the
    request = batch behavior (the window only opens when a request is
    already in hand, so a lone request pays at most ``window_ms`` extra).
    """

    _SENTINEL = object()

    def __init__(self, engine, window_ms: float = 2.0, max_rows: int = 2048):
        self.engine = engine
        self.window = window_ms / 1e3
        self.max_rows = max_rows
        self.batches_run = 0
        self.rows_run = 0
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(
            target=self._loop, name="bm25-microbatcher", daemon=True
        )
        self._thread.start()

    def search(self, ids: np.ndarray, top_k: int,
               weights: np.ndarray | None = None):
        """Submit one request's (n, T) query matrix; blocks until scored."""
        item = {"ids": ids, "w": weights, "k": int(top_k),
                "ev": threading.Event(), "out": None}
        self._q.put(item)
        # poll the collector's liveness so a dead thread can't strand waiters
        while not item["ev"].wait(timeout=1.0):
            if not self._thread.is_alive():
                raise RuntimeError("MicroBatcher collector thread died")
        if isinstance(item["out"], Exception):
            raise item["out"]
        return item["out"]

    def close(self):
        self._q.put(self._SENTINEL)
        self._thread.join(timeout=10)

    # internal -----------------------------------------------------------

    def _loop(self):
        while True:
            first = self._q.get()
            if first is self._SENTINEL:
                return
            batch = [first]
            rows = len(first["ids"])
            deadline = time.monotonic() + self.window
            while rows < self.max_rows:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    item = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if item is self._SENTINEL:
                    self._flush(batch)
                    return
                batch.append(item)
                rows += len(item["ids"])
            self._flush(batch)

    def _flush(self, batch):
        by_k: dict[int, list] = {}
        for it in batch:
            by_k.setdefault(it["k"], []).append(it)
        for k, items in by_k.items():
            try:
                t_max = max(it["ids"].shape[1] for it in items)
                mats = [
                    np.pad(
                        it["ids"],
                        ((0, 0), (0, t_max - it["ids"].shape[1])),
                        constant_values=-1,
                    )
                    for it in items
                ]
                ids = np.concatenate(mats, axis=0)
                if any(it.get("w") is not None for it in items):
                    # mixed batch: plain queries ride the weighted path
                    # with unit weights (identical scores)
                    wmats = []
                    for it in items:
                        w = it.get("w")
                        if w is None:
                            w = (it["ids"] >= 0).astype(np.float32)
                        wmats.append(np.pad(
                            w, ((0, 0), (0, t_max - w.shape[1]))
                        ))
                    weights = np.concatenate(wmats, axis=0)
                    docs, scores = self.engine.search(
                        ids, top_k=k, weights=weights
                    )
                else:
                    docs, scores = self.engine.search(ids, top_k=k)
                self.batches_run += 1
                self.rows_run += len(ids)
                off = 0
                for it in items:
                    n = len(it["ids"])
                    it["out"] = (docs[off : off + n], scores[off : off + n])
                    off += n
            except Exception as e:  # deliver the failure to every waiter
                for it in items:
                    if it["out"] is None:
                        it["out"] = e
            finally:
                for it in items:
                    it["ev"].set()


class BM25RequestHandler(BaseHTTPRequestHandler):
    # set by Server
    engine = None
    tokenizer = None
    vocab = None
    corpus = None
    stats = None
    batcher = None  # optional MicroBatcher
    metrics = None  # ServerMetrics

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def do_GET(self):
        if self.path.startswith("/healthz"):
            payload = {"status": "ok", **(self.stats or {})}
            if self.metrics is not None:
                payload["metrics"] = self.metrics.snapshot(self.batcher)
            if "deep=1" in self.path:
                from bm25_tpu.runtime.health import device_probe, engine_probe

                dev = device_probe()
                eng = engine_probe(self.engine)
                payload["device_probe"] = dev.as_dict()
                payload["engine_probe"] = eng.as_dict()
                if not (dev.ok and eng.ok):
                    payload["status"] = "unhealthy"
                    self._send(503, payload)
                    return
            self._send(200, payload)
        else:
            self._send(404, {"error": "not found"})

    def do_POST(self):
        if self.path != "/search":
            self._send(404, {"error": "not found"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            queries = req.get("queries")
            if not isinstance(queries, list) or not queries:
                raise ValueError(
                    "'queries' must be a non-empty list of strings or "
                    "{term: weight} objects"
                )
            for q in queries:
                if not isinstance(q, (str, dict)):
                    raise ValueError(
                        "each query must be a string or a {term: weight} "
                        "object"
                    )
                if isinstance(q, dict):
                    for wt in q.values():
                        float(wt)  # raises ValueError on junk
            top_k = int(req.get("top_k", 10))
            if top_k < 1:
                raise ValueError("'top_k' must be >= 1")
            include_scores = bool(req.get("include_scores", True))
        except (TypeError, ValueError, json.JSONDecodeError) as e:
            self._send(400, {"error": str(e)})
            return

        t0 = time.monotonic()
        try:
            weighted = any(isinstance(q, dict) for q in queries)
            if weighted:
                ids, wts = self.tokenizer.tokenize_weighted_queries(
                    queries, self.vocab
                )
            else:
                ids = self.tokenizer.tokenize_queries(queries, self.vocab)
                wts = None
            search_ids = getattr(self.engine, "search_ids", None)
            if self.batcher is not None:
                docs, scores = self.batcher.search(ids, top_k=top_k,
                                                   weights=wts)
            elif not include_scores and search_ids is not None:
                # rankings-only: skip the score transfer entirely
                docs, scores = search_ids(ids, top_k=top_k, weights=wts), None
            elif wts is None:
                docs, scores = self.engine.search(ids, top_k=top_k)
            else:
                docs, scores = self.engine.search(ids, top_k=top_k,
                                                  weights=wts)
        except ValueError as e:
            # engine-level request validation (e.g. negative weights on a
            # tail-tier engine, out-of-range ids): the client's fault, not
            # a server error — don't pollute the error metrics
            self._send(400, {"error": str(e)})
            return
        except Exception as e:
            if self.metrics is not None:
                self.metrics.record_error()
            self._send(500, {"error": str(e)})
            return
        if self.metrics is not None:
            self.metrics.record(len(queries), time.monotonic() - t0)
        results = []
        for qi in range(len(queries)):
            row = []
            for ri, d in enumerate(docs[qi]):
                item = {"doc": int(d)}
                if scores is not None and include_scores:
                    item["score"] = float(scores[qi][ri])
                if self.corpus is not None:
                    item["text"] = self.corpus[int(d)].get("text", "")
                row.append(item)
            results.append(row)
        self._send(200, {"results": results})


class Server:
    """Owns the engine + HTTP server; use as a context manager in tests."""

    def __init__(self, index_dir: str, host: str = "127.0.0.1", port: int = 8225,
                 engine_mode: str = "auto", batch_window_ms: float = 0.0,
                 warmup_top_k: int = 0, engine_kwargs: dict | None = None):
        from bm25_tpu.index.io import MMapCorpus, load_index
        from bm25_tpu.models.auto import create_engine
        from bm25_tpu.text.tokenizer import Tokenizer

        index = load_index(index_dir)
        if index.vocab is None:
            raise ValueError("index has no vocab; cannot serve text queries")
        engine = create_engine(index, mode=engine_mode, **(engine_kwargs or {}))
        try:
            corpus = MMapCorpus.open(index_dir)
        except FileNotFoundError:
            corpus = None

        handler = type("Handler", (BM25RequestHandler,), {})
        handler.engine = engine
        handler.tokenizer = Tokenizer()
        handler.vocab = index.vocab
        handler.corpus = corpus
        self.batcher = (
            MicroBatcher(engine, window_ms=batch_window_ms)
            if batch_window_ms > 0
            else None
        )
        handler.batcher = self.batcher
        self.metrics = handler.metrics = ServerMetrics()
        handler.stats = {
            "num_docs": index.num_docs,
            "vocab_size": index.vocab_size,
            "engine": type(engine).__name__,
            "batch_window_ms": batch_window_ms,
        }
        if warmup_top_k > 0:
            # trigger the first-query JIT compile before accepting traffic
            # (cold compile through a remote-compile relay can take minutes;
            # observed 4m22s on the first live request without this)
            # T=8 hits the engines' floor query width (all queries with <= 8
            # terms share this compiled shape)
            t0 = time.monotonic()
            engine.search(np.full((1, 8), -1, np.int32), top_k=warmup_top_k)
            print(f"bm25-tpu warmup (top_k={warmup_top_k}): "
                  f"{time.monotonic() - t0:.1f}s")
        self.httpd = ThreadingHTTPServer((host, port), handler)

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def serve_forever(self):
        print(f"bm25-tpu serving on :{self.port}")
        self.httpd.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self.batcher is not None:
            self.batcher.close()

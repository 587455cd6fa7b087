"""HTTP serving daemon for a loaded BM25 index.

The reference is script-only (no server — SURVEY.md section 0); production
deployment needs a long-lived process with the index resident on device.
Stdlib-only JSON-over-HTTP:

    POST /search   {"queries": ["text", ...], "top_k": 10}
                -> {"results": [[{"doc": id, "score": s, "text": ...}]]}
    GET  /healthz  -> {"status": "ok", "num_docs": N, ...}

Batched: each request's queries run as one device batch.  Start with
``bm25-tpu serve <index_dir>`` or ``Server(...).serve_forever()``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class BM25RequestHandler(BaseHTTPRequestHandler):
    # set by Server
    engine = None
    tokenizer = None
    vocab = None
    corpus = None
    stats = None

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
                raise ValueError("'queries' must be a non-empty list of strings")
            top_k = int(req.get("top_k", 10))
            if top_k < 1:
                raise ValueError("'top_k' must be >= 1")
        except (ValueError, json.JSONDecodeError) as e:
            self._send(400, {"error": str(e)})
            return

        ids = self.tokenizer.tokenize_queries(queries, self.vocab)
        docs, scores = self.engine.search(ids, top_k=top_k)
        results = []
        for qi in range(len(queries)):
            row = []
            for d, s in zip(docs[qi], scores[qi]):
                item = {"doc": int(d), "score": float(s)}
                if self.corpus is not None:
                    item["text"] = self.corpus[int(d)].get("text", "")
                row.append(item)
            results.append(row)
        self._send(200, {"results": results})


class Server:
    """Owns the engine + HTTP server; use as a context manager in tests."""

    def __init__(self, index_dir: str, host: str = "127.0.0.1", port: int = 8225,
                 engine_mode: str = "auto"):
        from bm25_tpu.index.io import MMapCorpus, load_index
        from bm25_tpu.models.auto import create_engine
        from bm25_tpu.text.tokenizer import Tokenizer

        index = load_index(index_dir)
        if index.vocab is None:
            raise ValueError("index has no vocab; cannot serve text queries")
        engine = create_engine(index, mode=engine_mode)
        try:
            corpus = MMapCorpus.open(index_dir)
        except FileNotFoundError:
            corpus = None

        handler = type("Handler", (BM25RequestHandler,), {})
        handler.engine = engine
        handler.tokenizer = Tokenizer()
        handler.vocab = index.vocab
        handler.corpus = corpus
        handler.stats = {
            "num_docs": index.num_docs,
            "vocab_size": index.vocab_size,
            "engine": type(engine).__name__,
        }
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

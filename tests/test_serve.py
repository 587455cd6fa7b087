"""HTTP serving daemon end-to-end over a temp index."""

import json
import urllib.error
import urllib.request

import pytest

from bm25_tpu.index.builder import build_index
from bm25_tpu.serve import Server


@pytest.fixture(scope="module")
def server(tmp_path_factory, request):
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0)  # ephemeral port
    srv.start_background()
    yield srv
    srv.shutdown()


def _post(srv, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/search",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz", timeout=30
    ) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["num_docs"] == 4


def test_search_batch(server):
    out = _post(server, {"queries": ["does the fish purr like a cat?",
                                     "bird that can fly"], "top_k": 2})
    r = out["results"]
    assert len(r) == 2 and len(r[0]) == 2
    assert r[0][0]["doc"] == 0 and "feline" in r[0][0]["text"]
    assert r[1][0]["doc"] == 2


def test_search_bad_request(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"queries": []})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"queries": ["x"], "top_k": 0})
    assert e.value.code == 400


def test_unknown_route(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"http://127.0.0.1:{server.port}/nope", timeout=30)
    assert e.value.code == 404


def test_non_object_body_rejected(server):
    """A top-level JSON list/string/number gets a clean 400 on every
    endpoint (previously an AttributeError -> connection reset)."""
    # (/add checks --updatable before parsing, so it 400s either way)
    for path in ("/search", "/explain", "/reload"):
        for raw in (b"[1,2]", b'"x"', b"3"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}{path}", data=raw,
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=30)
            assert e.value.code == 400, (path, raw)
            assert "JSON object" in json.loads(e.value.read())["error"]


def test_healthz_deep(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz?deep=1", timeout=60
    ) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert h["device_probe"]["ok"] and h["engine_probe"]["ok"]


def test_concurrent_requests(server):
    import threading

    results = [None] * 6
    def hit(i):
        q = ["does the fish purr like a cat?", "bird that can fly"][i % 2]
        results[i] = _post(server, {"queries": [q], "top_k": 2})

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, r in enumerate(results):
        assert r is not None
        expect = 0 if i % 2 == 0 else 2
        assert r["results"][0][0]["doc"] == expect


# ---------------------------------------------------------------------------
# micro-batching (MicroBatcher + batch_window_ms server mode)
# ---------------------------------------------------------------------------


class _RecordingEngine:
    """Engine stub: top_k copies of the row-sum as 'scores', row index as doc."""

    def __init__(self):
        self.batch_sizes = []

    def search(self, ids, top_k):
        import numpy as np

        self.batch_sizes.append(len(ids))
        n = len(ids)
        scores = np.repeat(
            np.where(ids >= 0, ids, 0).sum(axis=1, keepdims=True), top_k, axis=1
        ).astype(np.float32)
        docs = np.tile(np.arange(top_k, dtype=np.int32), (n, 1))
        return docs, scores


def test_microbatcher_coalesces_and_splits():
    import threading

    import numpy as np

    from bm25_tpu.serve import MicroBatcher

    eng = _RecordingEngine()
    mb = MicroBatcher(eng, window_ms=200.0)
    try:
        outs = [None] * 4

        def submit(i):
            ids = np.full((i + 1, 3), i, dtype=np.int32)  # i+1 rows of token i
            outs[i] = mb.search(ids, top_k=2)

        threads = [threading.Thread(target=submit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # all four requests coalesced into one device call of 1+2+3+4 rows
        assert eng.batch_sizes == [10]
        for i, (docs, scores) in enumerate(outs):
            assert docs.shape == (i + 1, 2)
            assert (scores == 3 * i).all()  # each row's sum = 3 tokens of id i
    finally:
        mb.close()


def test_microbatcher_groups_by_top_k():
    import threading

    import numpy as np

    from bm25_tpu.serve import MicroBatcher

    eng = _RecordingEngine()
    mb = MicroBatcher(eng, window_ms=200.0)
    try:
        outs = {}

        def submit(k):
            outs[k] = mb.search(np.zeros((1, 2), np.int32), top_k=k)

        threads = [threading.Thread(target=submit, args=(k,)) for k in (3, 5, 3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # one flush, two engine calls (k=3 group of 2 rows, k=5 group of 1)
        assert sorted(eng.batch_sizes) == [1, 2]
        assert outs[3][0].shape[1] == 3 and outs[5][0].shape[1] == 5
    finally:
        mb.close()


def test_microbatcher_pads_mixed_query_widths():
    import threading

    import numpy as np

    from bm25_tpu.serve import MicroBatcher

    eng = _RecordingEngine()
    mb = MicroBatcher(eng, window_ms=200.0)
    try:
        outs = [None, None]

        def submit(i, t_width):
            outs[i] = mb.search(np.ones((1, t_width), np.int32), top_k=1)

        threads = [
            threading.Thread(target=submit, args=(0, 2)),
            threading.Thread(target=submit, args=(1, 6)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert eng.batch_sizes == [2]
        # padding is -1 (masked to 0 by the stub), so sums stay per-width
        assert outs[0][1][0, 0] == 2 and outs[1][1][0, 0] == 6
    finally:
        mb.close()


def test_microbatcher_propagates_engine_errors():
    import numpy as np

    from bm25_tpu.serve import MicroBatcher

    class Boom:
        def search(self, ids, top_k):
            raise RuntimeError("device on fire")

    mb = MicroBatcher(Boom(), window_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            mb.search(np.zeros((1, 2), np.int32), top_k=1)
    finally:
        mb.close()


@pytest.fixture(scope="module")
def batched_server(tmp_path_factory, request):
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_batched")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0, batch_window_ms=20.0)
    srv.start_background()
    yield srv
    srv.shutdown()


def test_batched_server_concurrent_correctness(batched_server):
    import threading

    results = [None] * 8

    def hit(i):
        q = ["does the fish purr like a cat?", "bird that can fly"][i % 2]
        results[i] = _post(batched_server, {"queries": [q], "top_k": 2})

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, r in enumerate(results):
        expect = 0 if i % 2 == 0 else 2
        assert r["results"][0][0]["doc"] == expect
    # the window actually coalesced concurrent requests into fewer dispatches
    assert batched_server.batcher.batches_run < batched_server.batcher.rows_run


def test_batched_server_healthz_reports_window(batched_server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{batched_server.port}/healthz", timeout=30
    ) as r:
        h = json.loads(r.read())
    assert h["batch_window_ms"] == 20.0


def test_server_warmup(tmp_path_factory, request, capsys):
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_warm")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0, warmup_top_k=3)
    try:
        assert "warmup (top_k=3)" in capsys.readouterr().out
        # the warmup bill is phase-attributed (compile vs relay vs other)
        bd = srv.last_warmup_breakdown
        assert bd is not None and bd["wall_s"] >= 0
        for key in ("jaxpr_trace_s", "lower_to_mlir_s",
                    "backend_compile_s", "other_s"):
            assert key in bd
        srv.start_background()
        out = _post(srv, {"queries": ["a cat that purrs"], "top_k": 3})
        assert out["results"][0][0]["doc"] == 0
        # ... and surfaced to operators on the deep health probe
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz?deep=1", timeout=30
        ) as r:
            h = json.loads(r.read())
        assert h["warmup_breakdown"] == bd
    finally:
        srv.shutdown()


def test_microbatcher_dead_collector_raises():
    import numpy as np

    from bm25_tpu.serve import MicroBatcher

    mb = MicroBatcher(_RecordingEngine(), window_ms=1.0)
    mb.close()  # collector exits cleanly; admission now refuses
    with pytest.raises(RuntimeError, match="draining"):
        mb.search(np.zeros((1, 2), np.int32), top_k=1)
    # a collector that dies WITHOUT the drain flag must not strand waiters
    mb2 = MicroBatcher(_RecordingEngine(), window_ms=1.0)
    mb2._q.put(MicroBatcher._SENTINEL)  # kill the thread, keep admission on
    mb2._thread.join(timeout=5)
    with pytest.raises(RuntimeError, match="collector thread died"):
        mb2.search(np.zeros((1, 2), np.int32), top_k=1)


def test_healthz_reports_request_metrics(tmp_path_factory, request):
    """VERDICT r1 item 7: /healthz must expose request count, latency
    percentiles and batch occupancy under load."""
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_metrics")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0, batch_window_ms=1.0)
    srv.start_background()
    try:
        for _ in range(3):
            _post(srv, {"queries": ["cat", "fish in water"], "top_k": 2})
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30
        ) as r:
            h = json.loads(r.read())
        m = h["metrics"]
        assert m["requests"] == 3 and m["queries"] == 6 and m["errors"] == 0
        assert m["latency_ms"]["p50"] > 0
        assert m["latency_ms"]["p99"] >= m["latency_ms"]["p50"]
        assert m["batches_run"] >= 1
        assert m["batch_occupancy"] >= 2.0  # each request carries 2 queries
    finally:
        srv.shutdown()


def test_search_weighted_terms(server):
    """{term: weight} queries score on device; up-weighting flips ranking."""
    # unweighted: "fish purr cat" ranks the cat doc first
    base = _post(server, {"queries": ["fish purr cat"], "top_k": 4})
    assert base["results"][0][0]["doc"] == 0
    # crank the fish weight: the fish doc must overtake
    out = _post(server, {"queries": [{"fish": 50.0, "purr": 1, "cat": 1}],
                         "top_k": 4})
    row = out["results"][0]
    assert "fish" in row[0]["text"]
    # weight 1.0 everywhere == plain query scores
    w1 = _post(server, {"queries": [{"fish": 1, "purr": 1, "cat": 1}],
                        "top_k": 4})
    for a, b in zip(w1["results"][0], base["results"][0]):
        assert a["doc"] == b["doc"]
        assert abs(a["score"] - b["score"]) < 1e-3


def test_search_weighted_bad_weight(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"queries": [{"fish": "heavy"}], "top_k": 2})
    assert e.value.code == 400


def test_search_include_scores_false(tmp_path_factory, request):
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_ro")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0, engine_mode="sparse")
    srv.start_background()
    try:
        out = _post(srv, {"queries": ["does the fish purr like a cat?"],
                          "top_k": 2, "include_scores": False})
        row = out["results"][0]
        assert row[0]["doc"] == 0 and "score" not in row[0]
        assert "text" in row[0]
        # same ranking as the scored response
        full = _post(srv, {"queries": ["does the fish purr like a cat?"],
                           "top_k": 2})
        assert [r["doc"] for r in row] == [r["doc"] for r in full["results"][0]]
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# serving hardening (round 3): caps, timeouts, back-pressure, reload, drain
# ---------------------------------------------------------------------------


def test_nonfinite_weight_rejected(server):
    """json.loads accepts NaN/Infinity literals; they must 400, not 200."""
    for bad in ("NaN", "Infinity", "-Infinity"):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/search",
            data=('{"queries": [{"fish": %s}], "top_k": 2}' % bad).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400


def test_request_size_caps(server):
    # too many queries
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"queries": ["x"] * 2000, "top_k": 1})
    assert e.value.code == 400
    # too many weighted terms
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"queries": [{f"t{i}": 1.0 for i in range(500)}],
                       "top_k": 1})
    assert e.value.code == 400
    # top_k beyond the cap
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"queries": ["x"], "top_k": 1 << 20})
    assert e.value.code == 400
    # oversized body
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"queries": ["y" * (2 << 20)], "top_k": 1})
    assert e.value.code == 400


def test_microbatcher_queue_full_raises():
    import threading

    import numpy as np

    from bm25_tpu.serve import MicroBatcher, QueueFullError

    gate = threading.Event()

    class Slow:
        def search(self, ids, top_k):
            gate.wait(timeout=10)
            n = len(ids)
            return (np.zeros((n, top_k), np.int32),
                    np.zeros((n, top_k), np.float32))

    mb = MicroBatcher(Slow(), window_ms=1.0, max_pending_rows=4)
    try:
        ts = [threading.Thread(
            target=lambda: mb.search(np.zeros((2, 2), np.int32), top_k=1)
        ) for _ in range(2)]
        for t in ts:
            t.start()
        deadline = __import__("time").monotonic() + 5
        while mb.pending_rows < 4 and __import__("time").monotonic() < deadline:
            __import__("time").sleep(0.01)
        with pytest.raises(QueueFullError):
            mb.search(np.zeros((1, 2), np.int32), top_k=1)
        gate.set()
        for t in ts:
            t.join(timeout=10)
        # pending count returns to zero after completion
        assert mb.pending_rows == 0
    finally:
        gate.set()
        mb.close()


def test_microbatcher_timeout():
    import threading

    import numpy as np

    from bm25_tpu.serve import MicroBatcher

    gate = threading.Event()

    class Slow:
        def search(self, ids, top_k):
            gate.wait(timeout=10)
            n = len(ids)
            return (np.zeros((n, top_k), np.int32),
                    np.zeros((n, top_k), np.float32))

    mb = MicroBatcher(Slow(), window_ms=1.0)
    try:
        # first request occupies the collector; the second expires in queue
        t = threading.Thread(
            target=lambda: mb.search(np.zeros((1, 2), np.int32), top_k=1)
        )
        t.start()
        import time as _t

        _t.sleep(0.1)
        with pytest.raises(TimeoutError):
            mb.search(np.zeros((1, 2), np.int32), top_k=1, timeout=0.05)
        gate.set()
        t.join(timeout=10)
    finally:
        gate.set()
        mb.close()


def test_microbatcher_isolates_bad_request():
    """ADVICE r2: one request's engine ValueError must not 400 its
    co-batched neighbors — the batch retries individually."""
    import threading

    import numpy as np

    from bm25_tpu.serve import MicroBatcher

    class Picky:
        def search(self, ids, top_k, weights=None):
            if weights is not None and (weights < 0).any():
                raise ValueError("negative weights unsupported")
            n = len(ids)
            return (np.tile(np.arange(top_k, dtype=np.int32), (n, 1)),
                    np.ones((n, top_k), np.float32))

    mb = MicroBatcher(Picky(), window_ms=50.0)
    try:
        results = {}

        def good():
            results["good"] = mb.search(
                np.zeros((1, 2), np.int32), top_k=2
            )

        def bad():
            try:
                mb.search(np.zeros((1, 2), np.int32), top_k=2,
                          weights=np.array([[-1.0, 1.0]], np.float32))
            except ValueError as e:
                results["bad"] = e

        ts = [threading.Thread(target=good), threading.Thread(target=bad)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=15)
        # the innocent request succeeded; only the offender saw the error
        assert isinstance(results["bad"], ValueError)
        docs, scores = results["good"]
        assert docs.shape == (1, 2)
    finally:
        mb.close()


def test_hot_reload(tmp_path_factory, request):
    """POST /reload swaps to a new index; old requests' answers change."""
    corpus = request.getfixturevalue("animal_corpus")
    d1 = tmp_path_factory.mktemp("idx_reload_a")
    d2 = tmp_path_factory.mktemp("idx_reload_b")
    build_index(corpus, save_to=str(d1), save_corpus=True)
    # second index: different corpus so the swap is observable
    corpus2 = ["the zebra gallops across the plain",
               "a silent submarine dives deep"]
    build_index(corpus2, save_to=str(d2), save_corpus=True)
    srv = Server(str(d1), port=0)
    srv.start_background()
    try:
        out = _post(srv, {"queries": ["cat"], "top_k": 1})
        assert "feline" in out["results"][0][0]["text"]
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/reload",
            data=json.dumps({"index_dir": str(d2)}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            rl = json.loads(r.read())
        assert rl["status"] == "reloaded" and rl["num_docs"] == 2
        out = _post(srv, {"queries": ["zebra"], "top_k": 1})
        assert "zebra" in out["results"][0][0]["text"]
        # healthz reflects the new index and counts the reload
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30
        ) as r:
            h = json.loads(r.read())
        assert h["num_docs"] == 2 and h["metrics"]["reloads"] == 1
        # reloading a nonexistent dir is the client's fault and keeps the
        # old engine serving
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/reload",
            data=json.dumps({"index_dir": "/does/not/exist"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        out = _post(srv, {"queries": ["zebra"], "top_k": 1})
        assert "zebra" in out["results"][0][0]["text"]
    finally:
        srv.shutdown()


def test_graceful_drain_finishes_queued_work():
    """close() must run every already-admitted request before exiting."""
    import threading

    import numpy as np

    from bm25_tpu.serve import MicroBatcher

    eng = _RecordingEngine()
    mb = MicroBatcher(eng, window_ms=200.0)  # long window: items sit queued
    outs = []
    ts = [threading.Thread(
        target=lambda: outs.append(
            mb.search(np.zeros((1, 2), np.int32), top_k=1)
        )
    ) for _ in range(3)]
    for t in ts:
        t.start()
    import time as _t

    deadline = _t.monotonic() + 5
    while mb.pending_rows < 3 and _t.monotonic() < deadline:
        _t.sleep(0.01)
    mb.drain(timeout=15)  # triggers immediate flush of the open window
    for t in ts:
        t.join(timeout=15)
    assert len(outs) == 3 and all(o is not None for o in outs)


def test_microbatcher_infra_errors_not_retried_per_item():
    """Round-3 review: only ValueError (request fault) triggers per-item
    retry; infrastructure errors deliver once to all waiters instead of
    amplifying into N calls against an unhealthy device."""
    import threading

    import numpy as np

    from bm25_tpu.serve import MicroBatcher

    calls = []

    class Flaky:
        def search(self, ids, top_k):
            calls.append(len(ids))
            raise RuntimeError("device on fire")

    mb = MicroBatcher(Flaky(), window_ms=200.0)
    try:
        errs = []

        def hit():
            try:
                mb.search(np.zeros((1, 2), np.int32), top_k=1)
            except RuntimeError as e:
                errs.append(e)

        ts = [threading.Thread(target=hit) for _ in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=15)
        assert len(errs) == 4
        # one coalesced attempt, NO per-item retries
        assert len(calls) == 1 and calls[0] == 4
    finally:
        mb.close()


def test_reload_auto_mode_swaps_with_zero_errors(tmp_path_factory, request):
    """Default (auto) reload picks swap when old+new fit the HBM budget:
    concurrent searches during the reload must see ZERO errors (the
    zero-downtime contract, VERDICT r4 item 3)."""
    import threading

    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_auto_swap")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0)
    srv.start_background()
    try:
        _post(srv, {"queries": ["cat"], "top_k": 1})  # warm
        stop = threading.Event()
        errors = []

        def hammer():
            while not stop.is_set():
                try:
                    out = _post(srv, {"queries": ["cat"], "top_k": 1})
                    assert "feline" in out["results"][0][0]["text"]
                except Exception as e:  # noqa: BLE001 — collect, fail below
                    errors.append(e)

        threads = [threading.Thread(target=hammer) for _ in range(4)]
        for t in threads:
            t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/reload", data=b"{}",
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                rl = json.loads(r.read())
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=15)
        assert rl["status"] == "reloaded"
        assert rl["mode"] == "swap", rl
        sizing = rl["sizing"]
        assert sizing["fits"] is True
        assert sizing["old_device_bytes"] > 0
        assert sizing["est_new_device_bytes"] > 0
        assert not errors, f"auto-swap reload surfaced errors: {errors[:3]}"
    finally:
        srv.shutdown()


def test_reload_auto_mode_drops_when_over_budget(tmp_path_factory, request,
                                                 monkeypatch):
    """Auto reload degrades to drop when the modeled old+new footprint
    exceeds the device budget (here forced tiny)."""
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_auto_drop")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0)
    srv.start_background()
    try:
        import bm25_tpu.models.sparse as sparse_mod

        monkeypatch.setattr(sparse_mod, "device_hbm_bytes", lambda *a: 64)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/reload", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            rl = json.loads(r.read())
        assert rl["mode"] == "drop", rl
        assert rl["sizing"]["fits"] is False
        out = _post(srv, {"queries": ["cat"], "top_k": 1})
        assert "feline" in out["results"][0][0]["text"]
    finally:
        srv.shutdown()


def test_reload_rejects_unknown_mode(tmp_path_factory, request):
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_badmode")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0)
    srv.start_background()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/reload",
            data=json.dumps({"mode": "yolo"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
    finally:
        srv.shutdown()


def test_reload_drop_mode_releases_engine_and_503s(tmp_path_factory, request):
    """mode='drop' serves 503 while the engine rebuilds, then recovers."""
    import threading
    import time as _t

    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_drop")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0)
    srv.start_background()
    try:
        # slow the engine build down so the 503 window is observable
        orig = srv._make_runtime
        gate = threading.Event()

        def slow_make(*a, **kw):
            gate.wait(timeout=10)
            return orig(*a, **kw)

        srv._make_runtime = slow_make
        t = threading.Thread(
            target=lambda: urllib.request.urlopen(
                urllib.request.Request(
                    f"http://127.0.0.1:{srv.port}/reload",
                    data=json.dumps({"mode": "drop"}).encode(),
                    headers={"Content-Type": "application/json"},
                ), timeout=60,
            ).read()
        )
        t.start()
        deadline = _t.monotonic() + 5
        saw_503 = saw_503_explain = False
        while _t.monotonic() < deadline and not (saw_503 and saw_503_explain):
            try:
                _post(srv, {"queries": ["cat"], "top_k": 1})
            except urllib.error.HTTPError as e:
                saw_503 = saw_503 or e.code == 503
            try:
                # /explain must report the same retryable 503 in the
                # rebuild window, not the permanent-sounding 409 the
                # stub runtime's index=None would otherwise trigger
                _post_path(srv, "/explain", {"query": "cat", "doc_id": 0})
            except urllib.error.HTTPError as e:
                assert e.code != 409, "explain 409'd during a reload window"
                saw_503_explain = saw_503_explain or e.code == 503
            _t.sleep(0.02)
        gate.set()
        t.join(timeout=30)
        assert saw_503, "drop-mode reload never exposed the 503 window"
        assert saw_503_explain, "explain never exposed the 503 window"
        # and the server recovers with the (re)loaded index
        out = _post(srv, {"queries": ["cat"], "top_k": 1})
        assert "feline" in out["results"][0][0]["text"]
    finally:
        gate.set()
        srv.shutdown()


def test_serve_from_device_checkpoint(tmp_path_factory, request):
    """bm25-tpu checkpoint + serve --device-checkpoint: the server warm-
    restarts from the checkpoint (no index build) and serves correctly."""
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_ck")
    build_index(corpus, save_to=str(d), save_corpus=True)
    ck = str(tmp_path_factory.mktemp("ck_dir") / "ck")

    from bm25_tpu.cli.main import main as cli_main

    assert cli_main(["checkpoint", str(d), "-o", ck]) == 0
    srv = Server(None, port=0, device_checkpoint=ck)
    srv.start_background()
    try:
        out = _post(srv, {"queries": ["does the fish purr like a cat?"],
                          "top_k": 2})
        assert out["results"][0][0]["doc"] == 0
        # no corpus dir -> no text in responses, but ids/scores work
        assert "text" not in out["results"][0][0]
        # reload without an index dir is a client error, not a crash
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/reload", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
    finally:
        srv.shutdown()

    # with the index dir alongside, corpus text comes back
    srv2 = Server(str(d), port=0, device_checkpoint=ck)
    srv2.start_background()
    try:
        out = _post(srv2, {"queries": ["bird that can fly"], "top_k": 1})
        assert "fly" in out["results"][0][0]["text"]
    finally:
        srv2.shutdown()


# -- live updates (updatable=True) ----------------------------------------


def _post_path(srv, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def _healthz(srv):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/healthz", timeout=30
    ) as r:
        return json.loads(r.read())


@pytest.fixture()
def upd_server(tmp_path_factory, request):
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("upd_idx")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0, updatable=True)
    srv.start_background()
    yield srv
    srv.shutdown()


def test_updates_rejected_without_flag(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_path(server, "/add", {"docs": ["a new document"]})
    assert e.value.code == 400
    assert "updatable" in json.loads(e.value.read())["error"]


def test_updatable_add_search_delete(upd_server):
    srv = upd_server
    h = _healthz(srv)
    assert h["updatable"] is True and h["updates"]["live_docs"] == 4

    # add two docs; one introduces a brand-new vocabulary term
    out = _post_path(srv, "/add", {
        "docs": ["the quokka is a smiling marsupial from rottnest",
                 "a second quokka document about marsupials"]})
    assert out["doc_ids"] == [4, 5] and out["live_docs"] == 6

    # the new term is queryable immediately, text comes back
    res = _post_path(srv, "/search",
                     {"queries": ["quokka marsupial"], "top_k": 3})
    top = res["results"][0]
    assert {top[0]["doc"], top[1]["doc"]} == {4, 5}
    assert "quokka" in top[0]["text"]

    # weighted query against the grown vocab
    res = _post_path(srv, "/search",
                     {"queries": [{"quokka": 2.0, "bird": 0.5}], "top_k": 2})
    assert res["results"][0][0]["doc"] in (4, 5)

    # delete one; it stops appearing at once
    out = _post_path(srv, "/delete", {"doc_ids": [4]})
    assert out["deleted"] == 1 and out["live_docs"] == 5
    res = _post_path(srv, "/search",
                     {"queries": ["quokka marsupial"], "top_k": 3})
    docs = [r["doc"] for r in res["results"][0]]
    assert 4 not in docs and 5 in docs

    h = _healthz(srv)
    assert h["updates"]["delta_docs"] == 2
    assert h["updates"]["deleted_docs"] == 1


def test_updatable_bad_requests(upd_server):
    srv = upd_server
    for path, payload in [
        ("/add", {"docs": []}),
        ("/add", {"docs": [123]}),
        ("/add", {}),
        ("/delete", {"doc_ids": []}),
        ("/delete", {"doc_ids": ["x"]}),
        ("/delete", {"doc_ids": [99999]}),  # out of range
        ("/compact", {"save_dir": 7}),
    ]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_path(srv, path, payload)
        assert e.value.code == 400, (path, payload)


def test_updatable_compact_and_save(upd_server, tmp_path):
    srv = upd_server
    _post_path(srv, "/add", {
        "docs": ["axolotl regeneration is remarkable"]})
    _post_path(srv, "/delete", {"doc_ids": [1]})

    save_dir = str(tmp_path / "compacted")
    out = _post_path(srv, "/compact", {"save_dir": save_dir})
    assert out["status"] == "compacted" and out["live_docs"] == 4
    assert out["saved_to"] == save_dir

    h = _healthz(srv)
    assert h["updates"]["delta_docs"] == 0
    assert h["updates"]["deleted_docs"] == 0

    # ids were reassigned: the axolotl doc is now id 3 (live order), and
    # scores are current-corpus-exact -> equal to a fresh fit on the texts
    res = _post_path(srv, "/search",
                     {"queries": ["axolotl regeneration"], "top_k": 1})
    assert res["results"][0][0]["doc"] == 3
    assert "axolotl" in res["results"][0][0]["text"]

    # the saved artifact set round-trips through a fresh (plain) server
    srv2 = Server(save_dir, port=0)
    srv2.start_background()
    try:
        res2 = _post_path(srv2, "/search",
                          {"queries": ["axolotl regeneration"], "top_k": 1})
        assert res2["results"][0][0]["doc"] == 3
        assert (res2["results"][0][0]["score"]
                == pytest.approx(res["results"][0][0]["score"]))
    finally:
        srv2.shutdown()

    # post-compaction mutation keeps working (fresh stats snapshot)
    out = _post_path(srv, "/add", {"docs": ["one more axolotl fact"]})
    assert out["doc_ids"] == [4]
    res = _post_path(srv, "/search",
                     {"queries": ["axolotl"], "top_k": 2})
    docs = [r["doc"] for r in res["results"][0]]
    assert set(docs) == {3, 4}


def test_updatable_rejects_device_checkpoint():
    with pytest.raises(ValueError, match="updatable"):
        Server(None, port=0, updatable=True, device_checkpoint="/tmp/x")


def test_updatable_with_microbatcher_concurrent(tmp_path_factory, request):
    """Adds racing searches through the batcher: no 400s, no wrong hits."""
    import threading

    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("upd_mb_idx")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0, updatable=True, batch_window_ms=5.0)
    srv.start_background()
    try:
        errors = []

        def searcher():
            for _ in range(20):
                try:
                    _post_path(srv, "/search",
                               {"queries": ["fish cat", "capybara rodent"],
                                "top_k": 2})
                except Exception as e:  # noqa: BLE001
                    errors.append(e)

        threads = [threading.Thread(target=searcher) for _ in range(4)]
        for t in threads:
            t.start()
        for i in range(10):
            _post_path(srv, "/add",
                       {"docs": [f"capybara rodent fact number {i}"]})
        for t in threads:
            t.join()
        assert not errors
        res = _post_path(srv, "/search",
                         {"queries": ["capybara rodent"], "top_k": 10})
        docs = {r["doc"] for r in res["results"][0]}
        assert docs & set(range(4, 14))  # added docs rank for their term
    finally:
        srv.shutdown()


def test_updatable_without_corpus(tmp_path_factory, request):
    """Index saved without texts: adds searchable with correct overlay
    text, compact refused (base texts unrecoverable) until base docs go."""
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("upd_nocorpus_idx")
    build_index(corpus, save_to=str(d), save_corpus=False)
    srv = Server(str(d), port=0, updatable=True)
    srv.start_background()
    try:
        out = _post_path(srv, "/add", {"docs": ["a quokka marsupial doc"]})
        assert out["doc_ids"] == [4]
        res = _post_path(srv, "/search",
                         {"queries": ["quokka"], "top_k": 1})
        top = res["results"][0][0]
        # overlay text lands at the right global id despite no base corpus
        assert top["doc"] == 4 and "quokka" in top["text"]
        res = _post_path(srv, "/search", {"queries": ["cat"], "top_k": 1})
        assert res["results"][0][0]["text"] == ""  # base text unavailable

        with pytest.raises(urllib.error.HTTPError) as e:
            _post_path(srv, "/compact", {})
        assert e.value.code == 400
        assert "corpus" in json.loads(e.value.read())["error"]

        # once every base doc is tombstoned, compaction is possible again
        _post_path(srv, "/delete", {"doc_ids": [0, 1, 2, 3]})
        out = _post_path(srv, "/compact", {})
        assert out["live_docs"] == 1
        res = _post_path(srv, "/search",
                         {"queries": ["quokka"], "top_k": 1})
        assert res["results"][0][0]["doc"] == 0
    finally:
        srv.shutdown()


# -- write-ahead log durability (updatable=True) --------------------------


def _build_upd_idx(tmp_path_factory, request, name, save_corpus=True):
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp(name)
    build_index(corpus, save_to=str(d), save_corpus=save_corpus)
    return str(d)


def test_wal_replays_acked_ops_after_kill(tmp_path_factory, request):
    """Acked /add and /delete survive a restart bit-for-bit: same doc ids,
    same scores, same texts, tombstones intact."""
    d = _build_upd_idx(tmp_path_factory, request, "wal_idx")
    srv = Server(d, port=0, updatable=True)
    srv.start_background()
    try:
        out = _post_path(srv, "/add",
                         {"docs": ["a quokka is a smiling marsupial",
                                   "a wombat digs square scat burrows"]})
        assert out["doc_ids"] == [4, 5]
        _post_path(srv, "/delete", {"doc_ids": [1]})
        before = _post_path(srv, "/search",
                            {"queries": ["quokka", "dog"], "top_k": 3})
    finally:
        srv.shutdown()  # no compact: state lives only in the WAL

    srv2 = Server(d, port=0, updatable=True)
    srv2.start_background()
    try:
        assert srv2._handler.runtime.stats["wal_replayed"] == 2
        after = _post_path(srv2, "/search",
                           {"queries": ["quokka", "dog"], "top_k": 3})
        assert after == before  # ids, scores, texts all reproduced
        docs1 = [it["doc"] for it in after["results"][1] if it["score"] > 0]
        assert 1 not in docs1  # tombstone survived the restart
        # the replayed delta keeps accepting ops at the right ids
        out = _post_path(srv2, "/add", {"docs": ["another marsupial doc"]})
        assert out["doc_ids"] == [6]
    finally:
        srv2.shutdown()


def test_wal_logged_compact_replays_deterministically(tmp_path_factory,
                                                      request):
    """In-memory compact is logged; replay re-runs the rebuild so ops
    logged AFTER it resolve against the remapped ids."""
    d = _build_upd_idx(tmp_path_factory, request, "wal_cpt_idx")
    srv = Server(d, port=0, updatable=True)
    srv.start_background()
    try:
        _post_path(srv, "/add", {"docs": ["a quokka is a smiling marsupial"]})
        _post_path(srv, "/delete", {"doc_ids": [0]})
        out = _post_path(srv, "/compact", {})  # no save_dir: logged
        assert out["live_docs"] == 4
        # post-compact op against REMAPPED ids (old doc 4 is now doc 3)
        _post_path(srv, "/delete", {"doc_ids": [0]})
        before = _post_path(srv, "/search",
                            {"queries": ["quokka", "dog"], "top_k": 3})
    finally:
        srv.shutdown()

    srv2 = Server(d, port=0, updatable=True)
    srv2.start_background()
    try:
        assert srv2._handler.runtime.stats["wal_replayed"] == 4
        after = _post_path(srv2, "/search",
                           {"queries": ["quokka", "dog"], "top_k": 3})
        assert after == before
        assert srv2._handler.runtime.engine.live_docs == 3
    finally:
        srv2.shutdown()


def test_wal_truncated_by_persisted_compact(tmp_path_factory, request):
    """compact {"save_dir": <served dir>} folds the log into the new base:
    the WAL is emptied and the restart does no replay."""
    import os

    d = _build_upd_idx(tmp_path_factory, request, "wal_trunc_idx")
    srv = Server(d, port=0, updatable=True)
    srv.start_background()
    try:
        _post_path(srv, "/add", {"docs": ["a quokka is a smiling marsupial"]})
        from bm25_tpu.index.updates import UpdateLog

        assert len(UpdateLog(d).read_pending()) == 1
        out = _post_path(srv, "/compact", {"save_dir": d})
        assert out["saved_to"] == d
        # folded: the log is reset to a sig-only header for the NEW base
        assert UpdateLog(d).read_pending() == []
    finally:
        srv.shutdown()

    srv2 = Server(d, port=0, updatable=True)
    srv2.start_background()
    try:
        assert "wal_replayed" not in srv2._handler.runtime.stats
        res = _post_path(srv2, "/search", {"queries": ["quokka"], "top_k": 1})
        top = res["results"][0][0]
        assert top["score"] > 0 and "quokka" in top["text"]  # in the base now
    finally:
        srv2.shutdown()


def test_wal_torn_tail_dropped_with_warning(tmp_path_factory, request):
    """A crash mid-append leaves a torn final line; it was never acked, so
    startup drops it (with a warning) and replays the complete prefix."""
    import os
    import warnings

    d = _build_upd_idx(tmp_path_factory, request, "wal_torn_idx")
    srv = Server(d, port=0, updatable=True)
    srv.start_background()
    try:
        _post_path(srv, "/add", {"docs": ["a quokka is a smiling marsupial"]})
    finally:
        srv.shutdown()
    with open(os.path.join(d, "updates.wal"), "a", encoding="utf-8") as f:
        f.write('{"op": "add", "docs": ["torn rec')  # no newline: torn

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        srv2 = Server(d, port=0, updatable=True)
    assert any("torn" in str(x.message) for x in w)
    srv2.start_background()
    try:
        assert srv2._handler.runtime.stats["wal_replayed"] == 1
        res = _post_path(srv2, "/search", {"queries": ["quokka"], "top_k": 1})
        assert res["results"][0][0]["doc"] == 4
    finally:
        srv2.shutdown()


def test_wal_no_corpus_adds_survive_restart(tmp_path_factory, request):
    """Index saved WITHOUT corpus texts: added docs' texts live in the WAL,
    so a restart restores both the postings and the overlay texts."""
    d = _build_upd_idx(tmp_path_factory, request, "wal_nc_idx",
                       save_corpus=False)
    srv = Server(d, port=0, updatable=True)
    srv.start_background()
    try:
        _post_path(srv, "/add", {"docs": ["a quokka is a smiling marsupial"]})
    finally:
        srv.shutdown()

    srv2 = Server(d, port=0, updatable=True)
    srv2.start_background()
    try:
        res = _post_path(srv2, "/search", {"queries": ["quokka"], "top_k": 1})
        top = res["results"][0][0]
        assert top["doc"] == 4 and "quokka" in top["text"]
    finally:
        srv2.shutdown()


def test_wal_reload_switches_log(tmp_path_factory, request):
    """POST /reload to a different dir replays THAT dir's pending log and
    subsequent mutations land there, not in the old dir's log."""
    import os

    d1 = _build_upd_idx(tmp_path_factory, request, "wal_rl1_idx")
    d2 = _build_upd_idx(tmp_path_factory, request, "wal_rl2_idx")
    # seed d2 with a pending logged add from a previous serving run
    pre = Server(d2, port=0, updatable=True)
    pre.start_background()
    try:
        _post_path(pre, "/add", {"docs": ["a quokka is a smiling marsupial"]})
    finally:
        pre.shutdown()

    srv = Server(d1, port=0, updatable=True)
    srv.start_background()
    try:
        size1 = os.path.getsize(os.path.join(d1, "updates.wal")) \
            if os.path.exists(os.path.join(d1, "updates.wal")) else 0
        _post_path(srv, "/reload", {"index_dir": d2})
        res = _post_path(srv, "/search", {"queries": ["quokka"], "top_k": 1})
        assert res["results"][0][0]["doc"] == 4  # d2's logged add replayed
        _post_path(srv, "/delete", {"doc_ids": [4]})
        # the delete went to d2's log, d1's untouched
        s1 = os.path.getsize(os.path.join(d1, "updates.wal")) \
            if os.path.exists(os.path.join(d1, "updates.wal")) else 0
        assert s1 == size1
        assert os.path.getsize(os.path.join(d2, "updates.wal")) > 0
    finally:
        srv.shutdown()


# -- auto-compaction --------------------------------------------------------


def test_auto_compact_requires_updatable(tmp_path_factory, request):
    d = _build_upd_idx(tmp_path_factory, request, "ac_req_idx")
    with pytest.raises(ValueError, match="updatable"):
        Server(d, port=0, auto_compact=True)


def test_auto_compact_folds_delta(tmp_path_factory, request):
    """Crossing the delta threshold triggers a background compact that
    persists to the served dir and truncates the WAL."""
    import os
    import time

    d = _build_upd_idx(tmp_path_factory, request, "ac_idx")
    srv = Server(d, port=0, updatable=True, auto_compact=True,
                 auto_compact_interval_s=0.2, auto_compact_delta_docs=2)
    srv.start_background()
    try:
        _post_path(srv, "/add",
                   {"docs": ["a quokka is a smiling marsupial",
                             "a wombat digs square scat burrows",
                             "a numbat eats termites all day"]})
        deadline = time.monotonic() + 60
        h = None
        while time.monotonic() < deadline:
            h = _healthz(srv)
            # "updates" is absent for the instant of the drop-mode swap
            # (stub runtime has no engine)
            if h.get("updates", {}).get("delta_docs") == 0:
                break
            time.sleep(0.2)
        assert h is not None and h["updates"]["delta_docs"] == 0, h
        assert h["updates"]["live_docs"] == 7
        assert h["updates"]["auto_compact"] is True
        assert h["metrics"]["compactions"] >= 1
        # persisted: WAL folded into the base on disk (sig-only header)
        from bm25_tpu.index.updates import UpdateLog

        assert UpdateLog(d).read_pending() == []
        res = _post_path(srv, "/search", {"queries": ["numbat"], "top_k": 1})
        top = res["results"][0][0]
        assert top["score"] > 0 and "termites" in top["text"]
    finally:
        srv.shutdown()

    # restart finds the compacted base, nothing to replay
    srv2 = Server(d, port=0, updatable=True)
    srv2.start_background()
    try:
        assert "wal_replayed" not in srv2._handler.runtime.stats
        assert _healthz(srv2)["updates"]["live_docs"] == 7
    finally:
        srv2.shutdown()


def test_auto_compact_failure_warns_once_and_serving_survives(
        tmp_path_factory, request, capsys):
    """Auto-compact on a no-corpus index cannot rebuild base texts: it
    must log, not crash the policy thread, and not spin the 503 window."""
    import time

    d = _build_upd_idx(tmp_path_factory, request, "ac_fail_idx",
                       save_corpus=False)
    srv = Server(d, port=0, updatable=True, auto_compact=True,
                 auto_compact_interval_s=0.1, auto_compact_delta_docs=1)
    srv.start_background()
    try:
        _post_path(srv, "/add",
                   {"docs": ["a quokka is a smiling marsupial",
                             "a wombat digs square scat burrows"]})
        time.sleep(1.5)  # several intervals: must attempt once, then hold
        h = _healthz(srv)
        assert h["updates"]["delta_docs"] == 2  # compaction never succeeded
        assert h["metrics"]["compactions"] == 0
        res = _post_path(srv, "/search", {"queries": ["quokka"], "top_k": 1})
        assert res["results"][0][0]["score"] > 0  # serving unaffected
    finally:
        srv.shutdown()
    out = capsys.readouterr().out
    assert out.count("auto-compaction failed") == 1  # warned once, no spin


# -- filtered search over HTTP (filter_ids) ---------------------------------


def test_search_filter_ids(server):
    """Allowlist restricts results; rows end early on shortfall."""
    out = _post(server, {"queries": ["does the fish purr like a cat?"],
                         "top_k": 3, "filter_ids": [1, 3]})
    row = out["results"][0]
    assert [it["doc"] for it in row] == [3, 1]  # fish doc wins, cat excluded
    assert all(it["score"] >= 0 for it in row)
    # single-doc allowlist: the row has exactly one entry despite top_k=3
    out = _post(server, {"queries": ["cat"], "top_k": 3, "filter_ids": [2]})
    assert [it["doc"] for it in out["results"][0]] == [2]


def test_search_filter_ids_validation(server):
    for bad, msg in [
        ([], "non-empty"),
        (["x"], "non-empty list of doc ids"),
        ([99], "out of range"),
        ([-1], "out of range"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, {"queries": ["cat"], "top_k": 2,
                           "filter_ids": bad})
        assert e.value.code == 400
        assert msg in json.loads(e.value.read())["error"]


def test_search_filter_ids_with_batcher_and_updatable(tmp_path_factory,
                                                      request):
    """Masked requests bypass the micro-batcher (per-request mask) and
    compose with live adds on an updatable server."""
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("filter_upd_idx")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0, updatable=True, batch_window_ms=5.0)
    srv.start_background()
    try:
        out = _post_path(srv, "/add", {"docs": ["a quokka cat marsupial"]})
        new_id = out["doc_ids"][0]
        res = _post_path(srv, "/search",
                         {"queries": ["cat"], "top_k": 3,
                          "filter_ids": [new_id]})
        row = res["results"][0]
        assert [it["doc"] for it in row] == [new_id]
        assert "quokka" in row[0]["text"]
        # weighted query + filter together
        res = _post_path(srv, "/search",
                         {"queries": [{"cat": 2.0, "dog": 1.0}], "top_k": 2,
                          "filter_ids": [1]})
        assert [it["doc"] for it in res["results"][0]] == [1]
    finally:
        srv.shutdown()


def test_wal_stale_generation_discarded_on_restart(tmp_path_factory,
                                                   request):
    """Simulates a crash between a persisted compact's save_index and its
    log reset: pending ops + a rebuilt base. Restart must NOT replay the
    (folded) ops — base-generation fencing discards them."""
    import warnings

    corpus = request.getfixturevalue("animal_corpus")
    d = _build_upd_idx(tmp_path_factory, request, "wal_stale_idx")
    srv = Server(d, port=0, updatable=True)
    srv.start_background()
    try:
        _post_path(srv, "/add", {"docs": ["a quokka is a smiling marsupial"]})
    finally:
        srv.shutdown()
    # the base is rebuilt under the log (as a crashed fold would leave it)
    build_index(corpus + ["a quokka is a smiling marsupial"],
                save_to=d, save_corpus=True)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        srv2 = Server(d, port=0, updatable=True)
    assert any("base artifacts changed" in str(x.message) for x in w)
    srv2.start_background()
    try:
        assert "wal_replayed" not in srv2._handler.runtime.stats
        res = _post_path(srv2, "/search", {"queries": ["quokka"], "top_k": 1})
        top = res["results"][0][0]
        # exactly one quokka doc: the folded one, not a replayed duplicate
        assert top["doc"] == 4 and srv2._handler.runtime.engine.num_docs == 5
    finally:
        srv2.shutdown()


def test_reload_failure_keeps_old_wal(tmp_path_factory, request):
    """A reload whose target WAL is corrupt must fail WITHOUT repointing
    the live log: later acked mutations keep logging to the served dir."""
    import os

    d1 = _build_upd_idx(tmp_path_factory, request, "wal_rlf1_idx")
    d2 = _build_upd_idx(tmp_path_factory, request, "wal_rlf2_idx")
    with open(os.path.join(d2, "updates.wal"), "w", encoding="utf-8") as f:
        f.write("garbage line\n")
        f.write('{"op": "delete", "doc_ids": [0]}\n')  # hole -> read raises

    srv = Server(d1, port=0, updatable=True)
    srv.start_background()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_path(srv, "/reload", {"index_dir": d2})
        assert e.value.code == 500
        # old index still serves, and a new acked add lands in d1's log
        _post_path(srv, "/add", {"docs": ["a quokka is a smiling marsupial"]})
    finally:
        srv.shutdown()
    from bm25_tpu.index.updates import UpdateLog

    assert len(UpdateLog(d1).read_pending()) == 1
    srv2 = Server(d1, port=0, updatable=True)
    srv2.start_background()
    try:
        res = _post_path(srv2, "/search", {"queries": ["quokka"], "top_k": 1})
        assert res["results"][0][0]["doc"] == 4  # the add survived
    finally:
        srv2.shutdown()


def test_wal_poison_disables_mutations_not_search(tmp_path_factory,
                                                  request):
    """After a failed log append, mutations 500 (never silently diverge
    from the log) while searches keep serving."""
    d = _build_upd_idx(tmp_path_factory, request, "wal_poison_idx")
    srv = Server(d, port=0, updatable=True)
    srv.start_background()
    try:
        srv._wal_broken = True  # as a failed fsync would leave it
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_path(srv, "/add", {"docs": ["doomed doc"]})
        assert e.value.code == 500
        assert "update log" in json.loads(e.value.read())["error"]
        assert srv._handler.runtime.engine.num_docs == 4  # nothing applied
        res = _post_path(srv, "/search", {"queries": ["cat"], "top_k": 1})
        assert res["results"][0][0]["doc"] == 0  # searches unaffected
    finally:
        srv.shutdown()


def test_filter_ids_rejects_booleans(server):
    """isinstance(True, int) is True: [true, false] must 400, not filter
    to docs 1 and 0."""
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"queries": ["cat"], "top_k": 2,
                       "filter_ids": [True, False]})
    assert e.value.code == 400


def test_doc_mask_tolerates_racing_add():
    """A mask built from a num_docs snapshot that a concurrent add outgrew
    is padded False (newer docs ineligible), not rejected."""
    import numpy as np

    from bm25_tpu.index.updates import UpdatableEngine
    from bm25_tpu.reference import ReferenceEngine
    from bm25_tpu.scoring import build_scored_index

    docs_tok = [np.array([0, 1], np.int32), np.array([1, 2], np.int32)]
    idx = build_scored_index(docs_tok, vocab_size=3)
    upd = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)
    snapshot_mask = np.ones(upd.num_docs, bool)  # built pre-add
    upd.add([np.array([0, 1, 2], np.int32)])  # the race
    docs, scores = upd.search(np.array([[0, 1, 2]], np.int32), top_k=3,
                              doc_mask=snapshot_mask)
    real = docs[0][docs[0] >= 0]
    assert set(real.tolist()) == {0, 1}  # the post-snapshot doc is excluded


def test_wal_crash_replay_fuzz(tmp_path_factory, request):
    """Randomized kill/replay cycles: every acked mutation survives, no
    unacked record resurfaces.

    A client-side model tracks acked marker docs (alive/dead by unique
    token) through random add/delete/in-memory-compact/persisted-compact
    sequences across 3 restart cycles; one cycle also plants a torn
    unacked tail record.  After every restart each marker's visibility
    must match the model exactly — this pins the WAL ordering, the
    logged-compact deterministic replay, the persisted-compact fold +
    base-generation reset, and torn-tail tolerance in one state machine.
    """
    import os
    import random
    import warnings

    rng = random.Random(20260817)
    d = _build_upd_idx(tmp_path_factory, request, "wal_fuzz_idx")
    model: dict[str, bool] = {}  # unique token -> alive
    texts: dict[str, str] = {}
    n = 0

    def check(srv):
        for tok, alive in model.items():
            out = _post_path(srv, "/search", {"queries": [tok], "top_k": 1})
            hits = [it for it in out["results"][0] if it["score"] > 0]
            if alive:
                assert hits and hits[0]["text"] == texts[tok], (
                    f"alive doc {tok!r} lost")
            else:
                assert not hits or hits[0]["text"] != texts[tok], (
                    f"deleted doc {tok!r} resurfaced")

    for cycle in range(3):
        srv = Server(d, port=0, updatable=True)
        srv.start_background()
        try:
            check(srv)  # state from prior cycles replayed intact
            for _ in range(10):
                r = rng.random()
                eng = srv._handler.runtime.engine
                if r < 0.5 or not any(model.values()):
                    tok = f"zq{n}x"
                    text = f"{tok} fuzz marker document number {n}"
                    n += 1
                    _post_path(srv, "/add", {"docs": [text]})
                    model[tok], texts[tok] = True, text
                elif r < 0.8 and eng.live_docs > 3:
                    tok = rng.choice([t for t, a in model.items() if a])
                    out = _post_path(srv, "/search",
                                     {"queries": [tok], "top_k": 1})
                    doc_id = out["results"][0][0]["doc"]
                    _post_path(srv, "/delete", {"doc_ids": [doc_id]})
                    model[tok] = False
                elif r < 0.92:
                    _post_path(srv, "/compact", {})  # in-memory: logged
                else:
                    _post_path(srv, "/compact", {"save_dir": d})  # fold
            check(srv)
        finally:
            srv.shutdown()  # kill: un-compacted state lives only in the WAL
        if cycle == 1:
            # torn tail = a crash mid-append of an op that was never acked:
            # it must be dropped with a warning and everything before kept
            with open(os.path.join(d, "updates.wal"), "a") as f:
                f.write('{"op": "add", "docs": ["never ack')

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the torn-tail warning
        srv = Server(d, port=0, updatable=True)
    srv.start_background()
    try:
        check(srv)
        assert any(model.values())  # the fuzz actually left live markers
        assert not all(model.values())  # ... and dead ones
    finally:
        srv.shutdown()


def test_delete_rejects_booleans(upd_server):
    """isinstance(True, int) is True: {"doc_ids": [true, false]} must 400,
    not silently tombstone docs 1 and 0."""
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_path(upd_server, "/delete", {"doc_ids": [True, False]})
    assert e.value.code == 400
    # nothing was deleted
    assert _healthz(upd_server)["updates"]["deleted_docs"] == 0


def test_needs_compaction_reports_configured_thresholds(tmp_path_factory,
                                                        request):
    """/healthz and mutation responses judge compaction pressure against
    the server's CONFIGURED thresholds, not the hard-coded defaults."""
    d = _build_upd_idx(tmp_path_factory, request, "thresh_idx")
    srv = Server(d, port=0, updatable=True, auto_compact_delta_docs=1)
    srv.start_background()
    try:
        out = _post_path(srv, "/add", {"docs": ["doc one here",
                                                "doc two here"]})
        # 2 delta docs > the configured cap of 1; the default cap (50_000)
        # would report False
        assert out["needs_compaction"] is True
        assert _healthz(srv)["updates"]["needs_compaction"] is True
    finally:
        srv.shutdown()


def test_filtered_search_shares_admission_cap(tmp_path_factory, request):
    """filter_ids requests bypass the micro-batch QUEUE but must count
    against its pending-row cap: a burst can't queue unbounded device
    work the plain path would 429."""
    from bm25_tpu.serve import ServeLimits

    d = _build_upd_idx(tmp_path_factory, request, "fadm_idx")
    srv = Server(d, port=0, batch_window_ms=2.0,
                 limits=ServeLimits(max_pending_rows=2))
    srv.start_background()
    try:
        # 3 queries > cap of 2 -> immediate 429 on the filtered path
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, {"queries": ["cat", "dog", "bird"], "top_k": 1,
                        "filter_ids": [0, 1]})
        assert e.value.code == 429
        # within the cap: served, and the reservation is released after
        out = _post(srv, {"queries": ["cat", "dog"], "top_k": 1,
                          "filter_ids": [0, 1]})
        assert len(out["results"]) == 2
        assert srv.batcher.pending_rows == 0
    finally:
        srv.shutdown()


def test_socket_timeout_closes_stalled_connection(tmp_path_factory, request):
    """A client that promises a body and never sends it must not park a
    handler thread forever: the per-connection socket timeout closes it."""
    import socket
    import time

    from bm25_tpu.serve import ServeLimits

    d = _build_upd_idx(tmp_path_factory, request, "sockto_idx")
    srv = Server(d, port=0, limits=ServeLimits(socket_timeout_s=1.0))
    srv.start_background()
    try:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        s.sendall(b"POST /search HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: 100\r\n\r\n{\"partial")  # ... and stall
        s.settimeout(10)
        t0 = time.monotonic()
        data = b""
        try:
            while True:
                chunk = s.recv(4096)
                if not chunk:
                    break
                data += chunk
        except (ConnectionResetError, TimeoutError, socket.timeout):
            pass
        # the server gave up on the stalled read well under the probe's
        # own 10 s guard (socket_timeout_s=1), instead of hanging forever
        assert time.monotonic() - t0 < 8
        s.close()
        # ... and keeps serving others
        out = _post(srv, {"queries": ["cat"], "top_k": 1})
        assert out["results"][0][0]["doc"] == 0
    finally:
        srv.shutdown()


def test_compact_export_dir_keeps_served_wal(tmp_path_factory, request):
    """compact {"save_dir": <other dir>} is an EXPORT: the served dir keeps
    logging (the compact itself is write-ahead logged there), so a restart
    from the served dir reproduces acked post-compact mutations; the export
    dir restarts standalone at the compacted state."""
    d = _build_upd_idx(tmp_path_factory, request, "exp_src_idx")
    exp = str(tmp_path_factory.mktemp("exp_dst_idx"))
    srv = Server(d, port=0, updatable=True)
    srv.start_background()
    try:
        _post_path(srv, "/add", {"docs": ["a quokka is a smiling marsupial"]})
        out = _post_path(srv, "/compact", {"save_dir": exp})
        assert out["saved_to"] == exp
        # the server still serves (and logs to) the ORIGINAL dir
        assert srv._index_dir == d and srv._wal.index_dir == d
        _post_path(srv, "/add", {"docs": ["a wombat digs square burrows"]})
        before = _post_path(srv, "/search",
                            {"queries": ["quokka", "wombat"], "top_k": 1})
    finally:
        srv.shutdown()  # kill: post-compact state lives only in d's WAL

    # restart from the SERVED dir: compact + post-compact add replayed
    srv2 = Server(d, port=0, updatable=True)
    srv2.start_background()
    try:
        after = _post_path(srv2, "/search",
                           {"queries": ["quokka", "wombat"], "top_k": 1})
        assert after == before
    finally:
        srv2.shutdown()

    # the export restarts standalone at the compacted state (no replay)
    srv3 = Server(exp, port=0, updatable=True)
    srv3.start_background()
    try:
        assert "wal_replayed" not in srv3._handler.runtime.stats
        out = _post_path(srv3, "/search", {"queries": ["quokka"], "top_k": 1})
        assert out["results"][0][0]["score"] > 0
        assert srv3._handler.runtime.engine.live_docs == 5
    finally:
        srv3.shutdown()


def test_compact_apply_failure_poisons_mutations(tmp_path_factory, request):
    """An in-memory compact whose record is durable but whose apply fails
    must disable further mutations (they would log against diverged ids);
    a restart replays the log and converges to the compacted state."""
    d = _build_upd_idx(tmp_path_factory, request, "cfail_idx")
    srv = Server(d, port=0, updatable=True)
    srv.start_background()
    try:
        _post_path(srv, "/add", {"docs": ["a quokka is a smiling marsupial"]})

        def boom(*a, **k):
            raise RuntimeError("injected device build failure")

        orig = srv._make_runtime
        srv._make_runtime = boom
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_path(srv, "/compact", {})
        assert e.value.code == 500
        srv._make_runtime = orig
        # the WAL is poisoned (later mutations would log against ids the
        # in-memory state never remapped); the stub runtime 503s them
        assert srv._wal_broken is True
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_path(srv, "/add", {"docs": ["nope"]})
        assert e.value.code == 503
        # a /reload replays the log into a fresh runtime (compact included),
        # restoring log/state consistency — updatability comes back
        _post_path(srv, "/reload", {})
        assert srv._wal_broken is False
        out = _post_path(srv, "/add", {"docs": ["a numbat eats termites"]})
        assert out["status"] == "added"
        assert srv._handler.runtime.engine.delta_docs == 1  # compact folded
    finally:
        srv.shutdown()

    # ... and a full restart converges to the LOGGED state: the compact
    # replayed (quokka folded into the base) plus the post-reload add
    srv2 = Server(d, port=0, updatable=True)
    srv2.start_background()
    try:
        out = _post_path(srv2, "/search",
                         {"queries": ["quokka", "numbat"], "top_k": 1})
        assert out["results"][0][0]["score"] > 0
        assert out["results"][1][0]["score"] > 0
        assert srv2._handler.runtime.engine.delta_docs == 1
    finally:
        srv2.shutdown()


# -- /explain (per-term score breakdown) ------------------------------------


def test_explain_endpoint_matches_search(server):
    q = "does the fish purr like a cat?"
    out = _post(server, {"queries": [q], "top_k": 2})
    top = out["results"][0][0]
    exp = _post_path(server, "/explain", {"query": q, "doc_id": top["doc"]})
    assert exp["doc_id"] == top["doc"]
    assert abs(exp["score"] - top["score"]) < 1e-4
    matched = [t for t in exp["terms"] if t["matched"]]
    assert matched and all(t["df"] > 0 for t in matched)
    # weighted form works too
    expw = _post_path(
        server, "/explain", {"query": {"cat": 2.0}, "doc_id": 0}
    )
    (t,) = expw["terms"]
    assert t["weight"] == 2.0 and t["matched"]


def test_explain_endpoint_validation(server):
    for bad in (
        {"query": "cat"},                        # missing doc_id
        {"query": "cat", "doc_id": "zero"},      # non-int doc_id
        {"query": "cat", "doc_id": True},        # bool is not a doc id
        {"query": "cat", "doc_id": 99},          # out of range
        {"doc_id": 0},                           # missing query
        {"query": ["cat"], "doc_id": 0},         # wrong query type
        {"query": {"cat": float("inf")}, "doc_id": 0},  # non-finite weight
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_path(server, "/explain", bad)
        assert e.value.code == 400


def test_explain_unavailable_on_updatable(upd_server):
    """Updatable serving has no host CSC matching live ids -> 409, not
    wrong answers."""
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_path(upd_server, "/explain", {"query": "cat", "doc_id": 0})
    assert e.value.code == 409
    assert "explain unavailable" in json.loads(e.value.read())["error"]


def test_reload_window_503_has_retry_after(server):
    """During a drop-mode reload the stub runtime answers /search with a
    RETRYABLE 503: body says retry, and the Retry-After header is present
    (the client contract the serving soak's drop phase rides on — the
    window was measured at 77.5 s through the compile relay)."""
    from bm25_tpu.serve import EngineRuntime

    old_rt = server._handler.runtime
    server._handler.runtime = EngineRuntime(
        engine=None, tokenizer=old_rt.tokenizer, vocab=old_rt.vocab,
        corpus=old_rt.corpus, stats=dict(old_rt.stats, reloading=True),
    )
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/search",
            data=json.dumps({"queries": ["cat"], "top_k": 1}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected 503 from the reload stub")
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert e.headers.get("Retry-After") is not None
            body = json.loads(e.read())
            assert "retry" in body["error"]
    finally:
        server._handler.runtime = old_rt
    # the restored runtime serves again
    out = _post(server, {"queries": ["cat"], "top_k": 1})
    assert out["results"][0]


def test_serve_mmap_host_load(tmp_path_factory, request):
    """Server(mmap=True) memory-maps the host triplet and serves
    identical results (bm25s load(mmap=True) analog on the daemon)."""
    import numpy as np

    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_mmap")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0, mmap=True)
    srv.start_background()
    try:
        idx = srv._handler.runtime.index
        assert isinstance(idx.data, np.memmap)
        out = _post(srv, {"queries": ["does the fish purr like a cat"],
                          "top_k": 2})
        assert out["results"][0][0]["doc"] == 0
        # /reload keeps the mmap setting
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/reload", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.loads(r.read())["status"] == "reloaded"
        assert isinstance(srv._handler.runtime.index.data, np.memmap)
    finally:
        srv.shutdown()


def test_result_cache_serves_repeats_and_counts(tmp_path_factory, request):
    """--result-cache: an identical repeat query is served from the LRU
    (hit counters on /healthz), with a byte-identical response."""
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_rcache")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0, result_cache=8)
    srv.start_background()
    try:
        q = {"queries": ["does the fish purr like a cat"], "top_k": 2}
        first = _post(srv, q)
        second = _post(srv, q)
        assert second == first
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30
        ) as r:
            h = json.loads(r.read())
        rc = h["result_cache"]
        assert rc["hits"] == 1 and rc["misses"] == 1 and rc["entries"] == 1
        # different top_k = different key (no false sharing)
        third = _post(srv, {"queries": q["queries"][0:1], "top_k": 1})
        assert len(third["results"][0]) == 1
        # weighted queries bypass the cache entirely
        _post(srv, {"queries": [{"cat": 2.0}], "top_k": 1})
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30
        ) as r:
            rc2 = json.loads(r.read())["result_cache"]
        assert rc2["entries"] == 2  # the weighted query stored nothing
        # /reload swaps the runtime and with it a FRESH cache
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/reload", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60):
            pass
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30
        ) as r:
            rc3 = json.loads(r.read())["result_cache"]
        assert rc3["entries"] == 0 and rc3["hits"] == 0
    finally:
        srv.shutdown()


def test_result_cache_cleared_by_mutations(tmp_path_factory, request):
    """A cached row must never outlive an acked /add or /delete: the doc
    set changed, so the next identical query re-runs on device."""
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_rcache_mut")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0, updatable=True, result_cache=8)
    srv.start_background()
    try:
        q = {"queries": ["purr"], "top_k": 4}
        base = _post(srv, q)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/add",
            data=json.dumps({"docs": ["a second cat likes to purr"]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            added = json.loads(r.read())
        new_id = added["doc_ids"][0]
        after = _post(srv, q)
        docs = [item["doc"] for item in after["results"][0]]
        assert new_id in docs, "stale cached row survived an acked /add"
        assert after != base
        # delete clears it again: the new doc disappears from results
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/delete",
            data=json.dumps({"doc_ids": [new_id]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60):
            pass
        gone = _post(srv, q)
        assert new_id not in [i["doc"] for i in gone["results"][0]]
    finally:
        srv.shutdown()


def test_result_cache_lru_and_batch_semantics():
    """ResultCache unit contract: LRU eviction order and the
    all-or-nothing batch lookup (partial hit = miss, no phantom hits)."""
    from bm25_tpu.serve import ResultCache

    c = ResultCache(2)
    c.put(("a", 1, True), ["ra"])
    c.put(("b", 1, True), ["rb"])
    assert c.lookup_batch([("a", 1, True)]) == [["ra"]]
    # partial hit: returns None, counts ONLY the absent key as a miss
    assert c.lookup_batch([("a", 1, True), ("c", 1, True)]) is None
    s = c.stats()
    assert s["hits"] == 1 and s["misses"] == 1
    # "a" was touched by the full hit above -> "b" is the LRU victim
    c.put(("c", 1, True), ["rc"])
    assert c.lookup_batch([("b", 1, True)]) is None
    assert c.lookup_batch([("a", 1, True), ("c", 1, True)]) == [["ra"], ["rc"]]


def test_result_cache_composes_with_microbatcher(tmp_path_factory, request):
    """Cache hits short-circuit BEFORE the micro-batcher; misses still ride
    it. Both paths return identical payloads."""
    corpus = request.getfixturevalue("animal_corpus")
    d = tmp_path_factory.mktemp("idx_rcache_mb")
    build_index(corpus, save_to=str(d), save_corpus=True)
    srv = Server(str(d), port=0, batch_window_ms=2.0, result_cache=8)
    srv.start_background()
    try:
        q = {"queries": ["does the fish purr like a cat"], "top_k": 2}
        first = _post(srv, q)   # miss -> batcher -> device
        second = _post(srv, q)  # hit -> no batcher
        assert second == first
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30
        ) as r:
            h = json.loads(r.read())
        assert h["result_cache"]["hits"] == 1
        # the batcher only saw the miss
        assert h["metrics"]["requests"] >= 2
    finally:
        srv.shutdown()

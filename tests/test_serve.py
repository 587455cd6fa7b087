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

"""Multi-process (multi-host-shaped) end-to-end worker.

``python -m bm25_tpu.parallel._multihost_main <pid> <nproc> <port>
[devices_per_proc]`` joins a ``jax.distributed`` cluster over localhost,
builds a doc-sharded engine over the GLOBAL mesh (devices spanning all
processes), runs one query batch, and on process 0 checks the results
against the host oracle, printing ``MULTIHOST_OK`` on success.

This is the integration proof for the DCN story the reference lacks
(SURVEY.md section 2 accounting): every process holds the full host index
(as each host would after an all-host build or a shared filesystem load),
``jax.device_put`` against the global ``NamedSharding`` places only the
addressable shards locally, and the query's top-k merge collective spans
the process boundary.  Run under real multi-host TPU by passing each
host's process id — the code path is identical.

Used by tests/test_multihost.py (2 processes x 4 CPU devices).
"""

import sys


def main(pid: int, nproc: int, port: int, devices_per_proc: int = 4) -> int:
    import jax

    # must precede first backend use; in this container the CPU platform
    # can only be selected in-process (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", devices_per_proc)

    from bm25_tpu.parallel.distributed import initialize, process_info

    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=nproc, process_id=pid)
    idx_p, n_p = process_info()
    n_global = len(jax.devices())
    print(f"[p{pid}] process {idx_p}/{n_p}, {n_global} global devices",
          flush=True)
    if n_global != nproc * devices_per_proc:
        print(f"[p{pid}] FEDERATION FAILED: expected "
              f"{nproc * devices_per_proc} global devices", flush=True)
        return 2

    import numpy as np

    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine
    from bm25_tpu.scoring import build_scored_index
    from bm25_tpu.text.tokenizer import Tokenizer

    # deterministic synthetic corpus: every process builds the same index
    rng = np.random.default_rng(3)
    lengths = np.maximum(1, rng.poisson(25, 3000))
    ranks = np.arange(1, 501)
    p = (1.0 / ranks) / np.sum(1.0 / ranks)
    corpus = [" ".join(f"w{t:04d}" for t in rng.choice(500, size=L, p=p))
              for L in lengths]
    out = Tokenizer(stopwords=None, stemmer=None).tokenize_corpus(corpus)
    idx = build_scored_index(out.ids, vocab_size=len(out.vocab))

    mesh = make_mesh(n_global)
    eng = ShardedSparseEngine.from_scored_index(idx, mesh=mesh)
    q = np.array([[0, 3, 7, -1], [5, 5, -1, -1]], dtype=np.int32)
    docs, scores = eng.search(q, top_k=5)

    if pid != 0:
        return 0
    from bm25_tpu.reference import ReferenceEngine

    od, osc = ReferenceEngine.from_scored_index(idx).search(q, top_k=5)
    ok = bool(np.allclose(scores, osc, rtol=1e-5))
    # doc sets may legitimately differ where scores tie at the k boundary
    for a, b, sa in zip(docs, od, osc):
        strict = sa > sa[-1] + 1e-7
        ok &= set(np.asarray(a)[strict].tolist()) == set(
            np.asarray(b)[strict].tolist())
    print(f"[p0] docs={docs.tolist()}", flush=True)
    print("MULTIHOST_OK" if ok else "MULTIHOST_MISMATCH", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    sys.exit(main(*args))

"""On-chip validation of the slot-tiled ELL kernels (wide buckets).

The slot tiling exists for Mosaic/VMEM legality, which only the real
compiler checks (interpret mode on CPU validates semantics, not VMEM).
Compiles + runs both kernels past SLOT_TILE width and an engine over a
long-document corpus, parity-checked against the host oracle.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.ops.ell_score import SLOT_TILE, ell_score, ell_score_fused
    from bm25_tpu.reference import ReferenceEngine
    from bm25_tpu.scoring import build_scored_index

    assert jax.devices()[0].platform != "cpu", "needs the real chip"
    rng = np.random.default_rng(0)

    # kernel-level: 3 tiles, hot tier attached
    rows, h, q, t = 1024, 64, 128, 8
    l_pad = 3 * SLOT_TILE
    vocab = 8192
    tokT = np.full((l_pad, rows), -1, np.int32)
    valT = np.zeros((l_pad, rows), np.float32)
    for r in range(rows):
        n = rng.integers(l_pad // 2, l_pad)
        tokT[:n, r] = rng.choice(vocab, n, replace=False)
        valT[:n, r] = rng.random(n)
    ids = rng.integers(-1, vocab, (q, t)).astype(np.int32)
    did = np.arange(rows, dtype=np.int32)
    hotT = rng.standard_normal((h, rows)).astype(np.float32)
    hi = hotT.astype(jnp.bfloat16)
    lo = (hotT - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    hc = rng.integers(0, 3, (q, h)).astype(np.float32).astype(jnp.bfloat16)

    base, gmax = ell_score_fused(
        jnp.asarray(ids), jnp.asarray(tokT), jnp.asarray(valT),
        jnp.asarray(did), jnp.asarray(hc), jnp.asarray(hi), jnp.asarray(lo),
    )
    ref = np.asarray(
        ell_score(jnp.asarray(ids), jnp.asarray(tokT), jnp.asarray(valT),
                  "lax")
    )
    hot = (np.asarray(hc, np.float32) @ np.asarray(hi, np.float32)
           + np.asarray(hc, np.float32) @ np.asarray(lo, np.float32))
    err = np.abs(np.asarray(base) - (ref + hot)).max()
    print(f"[wide] fused kernel 3-tile max err {err:.2e}", flush=True)
    assert err < 1e-3

    # engine-level: long-document corpus end to end
    docs = [rng.integers(0, vocab, size=rng.integers(4, 40)).astype(np.int32)
            for _ in range(5000)]
    docs.append(rng.choice(vocab, size=1500, replace=False).astype(np.int32))
    docs.append(rng.choice(vocab, size=900, replace=False).astype(np.int32))
    idx = build_scored_index(docs, vocab_size=vocab)
    eng = SparseEngine.from_scored_index(idx, max_buckets=4)
    oracle = ReferenceEngine.from_scored_index(idx)
    queries = rng.integers(-1, vocab, size=(64, 8), dtype=np.int32)
    dd, ds = eng.search(queries, top_k=50)
    od, os_ = oracle.search(queries, top_k=50)
    err = np.abs(ds - os_).max()
    print(f"[wide] long-doc engine max score err {err:.2e}", flush=True)
    assert err < 1e-3
    print("[wide] OK", flush=True)


if __name__ == "__main__":
    main()

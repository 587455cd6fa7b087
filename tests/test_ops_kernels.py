"""Pallas kernel parity: gather_add_rows and ell_score vs oracles
(interpret mode on the CPU backend; identical kernels run on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bm25_tpu.ops.ell_score import BLOCK_ROWS, ell_score
from bm25_tpu.ops.gather_rows import gather_add_rows


@pytest.mark.parametrize("v,d,q,t", [(37, 300, 5, 4), (20, 16384, 3, 2),
                                     (11, 1024, 9, 1)])
def test_gather_add_rows_parity(v, d, q, t):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((v, d), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, v, (q, t)).astype(np.int32))
    a = np.asarray(gather_add_rows(table, ids, "lax"))
    b = np.asarray(gather_add_rows(table, ids, "pallas"))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    exp = np.asarray(table)[np.asarray(ids)].sum(1)
    np.testing.assert_allclose(a, exp, rtol=1e-6)


def _random_ell(rng, l_pad, rows, vocab, fill_max):
    tokT = np.full((l_pad, rows), -1, np.int32)
    valT = np.zeros((l_pad, rows), np.float32)
    for r in range(rows):
        n = rng.integers(1, fill_max + 1)
        tokT[:n, r] = rng.choice(vocab, n, replace=False)
        valT[:n, r] = rng.random(n)
    return tokT, valT


def _oracle(ids, tokT, valT):
    q, rows = ids.shape[0], tokT.shape[1]
    exp = np.zeros((q, rows), np.float32)
    for qq in range(q):
        qtok = ids[qq][ids[qq] >= 0]
        for r in range(rows):
            for l in range(tokT.shape[0]):
                if tokT[l, r] >= 0:
                    exp[qq, r] += valT[l, r] * int((qtok == tokT[l, r]).sum())
    return exp


def test_ell_score_parity_and_oracle():
    rng = np.random.default_rng(1)
    tokT, valT = _random_ell(rng, l_pad=16, rows=BLOCK_ROWS, vocab=50, fill_max=10)
    ids = rng.integers(-1, 50, (12, 5)).astype(np.int32)
    a = np.asarray(ell_score(jnp.asarray(ids), jnp.asarray(tokT),
                             jnp.asarray(valT), "pallas"))
    b = np.asarray(ell_score(jnp.asarray(ids), jnp.asarray(tokT),
                             jnp.asarray(valT), "lax"))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    np.testing.assert_allclose(a, _oracle(ids, tokT, valT), rtol=1e-5)


def test_ell_score_duplicate_query_tokens_count_twice():
    rng = np.random.default_rng(2)
    tokT, valT = _random_ell(rng, l_pad=8, rows=BLOCK_ROWS, vocab=20, fill_max=6)
    single = np.full((1, 4), -1, np.int32)
    single[0, 0] = 7
    double = np.full((1, 4), -1, np.int32)
    double[0, :2] = 7
    s1 = np.asarray(ell_score(jnp.asarray(single), jnp.asarray(tokT),
                              jnp.asarray(valT)))
    s2 = np.asarray(ell_score(jnp.asarray(double), jnp.asarray(tokT),
                              jnp.asarray(valT)))
    np.testing.assert_allclose(s2, 2 * s1, rtol=1e-6)


def test_ell_score_multirow_blocks_and_query_padding():
    rng = np.random.default_rng(3)
    tokT, valT = _random_ell(rng, l_pad=8, rows=2 * BLOCK_ROWS, vocab=30,
                             fill_max=6)
    ids = rng.integers(0, 30, (700, 3)).astype(np.int32)  # q not multiple of tile
    out = np.asarray(ell_score(jnp.asarray(ids), jnp.asarray(tokT),
                               jnp.asarray(valT)))
    assert out.shape == (700, 2 * BLOCK_ROWS)
    sample = slice(0, 5)
    np.testing.assert_allclose(
        out[sample], _oracle(ids[sample], tokT, valT), rtol=1e-5
    )


def test_gather_add_rows_column_blocked():
    """D large enough to trigger the multi-col-block path (nc > 1)."""
    rng = np.random.default_rng(4)
    d = 270336  # > 256 * 1024 -> two col blocks
    table = jnp.asarray(rng.random((3, d)).astype(np.float32))
    ids = jnp.asarray(np.array([[2]], dtype=np.int32))
    out = np.asarray(gather_add_rows(table, ids, "pallas"))
    np.testing.assert_allclose(out[0], np.asarray(table)[2], rtol=1e-6)


def test_ell_score_fused_matches_unfused_epilogue():
    """ell_score_fused == ell_score + hot matmul + mask + group maxima."""
    import jax

    from bm25_tpu.ops.ell_score import GROUP, ell_score_fused

    rng = np.random.default_rng(3)
    rows, h, q, t = 2 * BLOCK_ROWS, 16, 12, 5
    tokT, valT = _random_ell(rng, l_pad=8, rows=rows, vocab=60, fill_max=6)
    ids = rng.integers(-1, 60, (q, t)).astype(np.int32)
    did = np.arange(rows, dtype=np.int32)
    did[-7:] = -1  # pad rows
    hotT = rng.standard_normal((h, rows)).astype(np.float32)
    hot_hi = hotT.astype(jnp.bfloat16)
    hot_lo = (hotT - np.asarray(hot_hi, np.float32)).astype(jnp.bfloat16)
    hc = rng.integers(0, 3, (q, h)).astype(np.float32).astype(jnp.bfloat16)

    interpret = jax.devices()[0].platform != "tpu"
    base, gmax = ell_score_fused(
        jnp.asarray(ids), jnp.asarray(tokT), jnp.asarray(valT),
        jnp.asarray(did), jnp.asarray(hc), jnp.asarray(hot_hi),
        jnp.asarray(hot_lo), interpret=interpret,
    )
    ref = np.asarray(
        ell_score(jnp.asarray(ids), jnp.asarray(tokT), jnp.asarray(valT),
                  "lax")
    )
    hot = (np.asarray(hc, np.float32) @ np.asarray(hot_hi, np.float32)
           + np.asarray(hc, np.float32) @ np.asarray(hot_lo, np.float32))
    exp = np.where(did[None, :] >= 0, ref + hot, -np.inf)
    np.testing.assert_allclose(np.asarray(base), exp, rtol=1e-5, atol=1e-5)
    exp_gmax = exp.reshape(q, rows // GROUP, GROUP).max(-1)
    np.testing.assert_allclose(np.asarray(gmax), exp_gmax, rtol=1e-5,
                               atol=1e-5)


def test_ell_score_fused_no_hot():
    import jax

    from bm25_tpu.ops.ell_score import GROUP, ell_score_fused

    rng = np.random.default_rng(4)
    rows = BLOCK_ROWS
    tokT, valT = _random_ell(rng, l_pad=6, rows=rows, vocab=30, fill_max=5)
    ids = rng.integers(-1, 30, (9, 4)).astype(np.int32)
    did = np.arange(rows, dtype=np.int32)
    interpret = jax.devices()[0].platform != "tpu"
    base, gmax = ell_score_fused(
        jnp.asarray(ids), jnp.asarray(tokT), jnp.asarray(valT),
        jnp.asarray(did), interpret=interpret,
    )
    ref = np.asarray(ell_score(jnp.asarray(ids), jnp.asarray(tokT),
                               jnp.asarray(valT), "lax"))
    np.testing.assert_allclose(np.asarray(base), ref, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gmax), ref.reshape(9, rows // GROUP, GROUP).max(-1),
        rtol=1e-6,
    )


def test_ell_score_fused_ragged_query_count():
    """Ragged q (not a tile multiple, > BLOCK_Q) pads to a legal tiling.

    Reproduces the 8.84M-doc failure: a memory-budget chunk of 232
    queries produced an illegal transposed-gmax Mosaic block (the TPU
    lowering rejects it); the kernel now pads q up to the next legal
    size and slices the outputs back.
    """
    import jax.numpy as jnp

    from bm25_tpu.ops.ell_score import BLOCK_ROWS, GROUP, ell_score_fused

    rng = np.random.default_rng(5)
    q, t, rows, l = 232, 8, BLOCK_ROWS, 6
    ids = rng.integers(-1, 50, size=(q, t)).astype(np.int32)
    tok = np.full((8, rows), -1, dtype=np.int32)
    tok[:l] = rng.integers(0, 50, size=(l, rows)).astype(np.int32)
    val = np.zeros((8, rows), dtype=np.float32)
    val[:l] = rng.random((l, rows), dtype=np.float32)
    doc_ids = np.arange(rows, dtype=np.int32)
    base, gmax = ell_score_fused(
        jnp.array(ids), jnp.array(tok), jnp.array(val), jnp.array(doc_ids),
        interpret=True,
    )
    assert base.shape == (q, rows)
    assert gmax.shape == (q, rows // GROUP)
    # oracle: membership-count scan
    want = np.zeros((q, rows), np.float32)
    for s in range(8):
        cnt = (ids[:, :, None] == tok[s][None, None, :]).sum(1)
        want += cnt.astype(np.float32) * val[s][None, :]
    np.testing.assert_allclose(np.asarray(base), want, rtol=1e-5, atol=1e-5)


def test_sparse_chunk_sizes_stay_legal():
    """Budget-cut chunks round to kernel-legal sizes (<= BLOCK_Q or a
    multiple), so the fused kernel's internal padding can't exceed the
    score-buffer budget."""
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.ops.ell_score import BLOCK_Q
    from bm25_tpu.scoring import build_scored_index

    rng = np.random.default_rng(6)
    ids = [rng.integers(0, 64, size=rng.integers(3, 12)).astype(np.int32)
           for _ in range(600)]
    idx = build_scored_index(ids, vocab_size=64)
    eng = SparseEngine.from_scored_index(idx, hot_tokens=0)
    max_rows = max(b["doc_ids"].shape[0] for b in eng.buckets)
    # force a budget that would allow a ragged 232-ish chunk
    eng.score_buffer_budget = 4 * max_rows * 232
    queries = rng.integers(-1, 64, size=(300, 5), dtype=np.int32)
    dd, ds = eng.search(queries, top_k=7)
    assert dd.shape == (300, 7)
    # reconstruct the chunk size the engine would pick
    max_q = max(8, (eng.score_buffer_budget // (4 * max_rows)) // 8 * 8)
    if max_q > BLOCK_Q:
        max_q = max_q // BLOCK_Q * BLOCK_Q
    assert max_q <= BLOCK_Q or max_q % BLOCK_Q == 0


def test_ell_score_slot_tiled_wide_bucket():
    """Buckets wider than SLOT_TILE run the slot-tiled accumulation path
    (VMEM legality for long-document corpora) and match the lax oracle."""
    from bm25_tpu.ops.ell_score import SLOT_TILE, _slot_tiling, ell_score
    from bm25_tpu.utils.padding import next_multiple

    assert _slot_tiling(SLOT_TILE) == (SLOT_TILE, 1)
    # balanced tiling: tiles are sized evenly (8-aligned) so the padded
    # scan width l_tile*l_tiles overshoots l_pad by < 8 slots per tile
    lt, n = _slot_tiling(SLOT_TILE + 8)
    assert n == 2 and lt == next_multiple((SLOT_TILE + 8) // 2, 8)
    for l_pad in (SLOT_TILE + 8, 1208, 1536, 4096, 5000):
        lt, n = _slot_tiling(l_pad)
        assert lt <= SLOT_TILE and lt % 8 == 0
        assert lt * n >= l_pad and lt * n - l_pad < 8 * n

    # the VMEM hot cap must model the worst-case slot width over ANY
    # bucket (<= min(l_pad, SLOT_TILE)), not the balanced tiling of
    # l_pad itself: balanced tiles are non-monotonic in width (1032
    # tiles at 344 while a narrower 1024-wide bucket tiles at 512), so
    # the cap for a wide corpus must never exceed the SLOT_TILE cap
    from bm25_tpu.ops.ell_score import max_hot_for_vmem

    cap_at_tile = max_hot_for_vmem(SLOT_TILE)
    for l_pad in (SLOT_TILE + 8, 1032, 1208, 4096):
        assert max_hot_for_vmem(l_pad) == cap_at_tile
    assert max_hot_for_vmem(SLOT_TILE - 64) > cap_at_tile

    rng = np.random.default_rng(7)
    rows, q, t = BLOCK_ROWS, 6, 4
    l_pad = SLOT_TILE + 64  # 2 tiles, ragged final tile
    vocab = 3000
    tokT, valT = _random_ell(rng, l_pad=l_pad, rows=rows, vocab=vocab,
                             fill_max=l_pad - 1)
    ids = rng.integers(-1, vocab, (q, t)).astype(np.int32)
    got = np.asarray(
        ell_score(jnp.asarray(ids), jnp.asarray(tokT), jnp.asarray(valT),
                  "pallas")
    )
    ref = np.asarray(
        ell_score(jnp.asarray(ids), jnp.asarray(tokT), jnp.asarray(valT),
                  "lax")
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_ell_score_fused_slot_tiled_wide_bucket():
    """Fused kernel over a wide bucket: tile partials accumulate into the
    revisited output block, epilogue (hot matmul + mask + maxima) fires
    once on the final tile."""
    import jax

    from bm25_tpu.ops.ell_score import (
        GROUP, SLOT_TILE, ell_score, ell_score_fused)

    rng = np.random.default_rng(11)
    rows, h, q, t = BLOCK_ROWS, 8, 9, 3
    l_pad = 3 * SLOT_TILE  # 3 exact tiles
    vocab = 4000
    tokT, valT = _random_ell(rng, l_pad=l_pad, rows=rows, vocab=vocab,
                             fill_max=l_pad - 1)
    ids = rng.integers(-1, vocab, (q, t)).astype(np.int32)
    did = np.arange(rows, dtype=np.int32)
    did[-5:] = -1
    hotT = rng.standard_normal((h, rows)).astype(np.float32)
    hot_hi = hotT.astype(jnp.bfloat16)
    hot_lo = (hotT - np.asarray(hot_hi, np.float32)).astype(jnp.bfloat16)
    hc = rng.integers(0, 3, (q, h)).astype(np.float32).astype(jnp.bfloat16)

    interpret = jax.devices()[0].platform != "tpu"
    base, gmax = ell_score_fused(
        jnp.asarray(ids), jnp.asarray(tokT), jnp.asarray(valT),
        jnp.asarray(did), jnp.asarray(hc), jnp.asarray(hot_hi),
        jnp.asarray(hot_lo), interpret=interpret,
    )
    ref = np.asarray(
        ell_score(jnp.asarray(ids), jnp.asarray(tokT), jnp.asarray(valT),
                  "lax")
    )
    hot = (np.asarray(hc, np.float32) @ np.asarray(hot_hi, np.float32)
           + np.asarray(hc, np.float32) @ np.asarray(hot_lo, np.float32))
    exp = np.where(did[None, :] >= 0, ref + hot, -np.inf)
    np.testing.assert_allclose(np.asarray(base), exp, rtol=1e-5, atol=1e-5)
    exp_gmax = exp.reshape(q, rows // GROUP, GROUP).max(-1)
    np.testing.assert_allclose(np.asarray(gmax), exp_gmax, rtol=1e-5,
                               atol=1e-5)

    # weighted variant through the same tiled path
    w = rng.uniform(0.1, 2.0, (q, t)).astype(np.float32)
    base_w, _ = ell_score_fused(
        jnp.asarray(ids), jnp.asarray(tokT), jnp.asarray(valT),
        jnp.asarray(did), weights=jnp.asarray(w), interpret=interpret,
    )
    # oracle: per-token weighted membership
    exp_w = np.zeros((q, BLOCK_ROWS), np.float32)
    for qq in range(q):
        for ti in range(t):
            tok = ids[qq, ti]
            if tok < 0:
                continue
            exp_w[qq] += w[qq, ti] * np.where(tokT == tok, valT, 0).sum(0)
    exp_w = np.where(did[None, :] >= 0, exp_w, -np.inf)
    np.testing.assert_allclose(np.asarray(base_w), exp_w, rtol=1e-4,
                               atol=1e-4)


def test_long_document_corpus_end_to_end():
    """An engine over a corpus with a very long document (ELL width past
    SLOT_TILE) builds, compiles, and matches the oracle — the VMEM
    legality case the untiled kernel could not compile."""
    from bm25_tpu.models.sparse import SparseEngine
    from bm25_tpu.reference import ReferenceEngine
    from bm25_tpu.scoring import build_scored_index

    rng = np.random.default_rng(5)
    vocab = 1200
    docs = [rng.integers(0, vocab, size=rng.integers(3, 12)).astype(np.int32)
            for _ in range(60)]
    # one pathological long document: > SLOT_TILE unique terms
    docs.append(np.arange(700, dtype=np.int32))
    docs.append(rng.integers(0, vocab, size=640).astype(np.int32))
    idx = build_scored_index(docs, vocab_size=vocab)
    eng = SparseEngine.from_scored_index(idx, hot_tokens=4, max_buckets=2)
    oracle = ReferenceEngine.from_scored_index(idx)
    queries = rng.integers(-1, vocab, size=(8, 6), dtype=np.int32)
    dd, ds = eng.search(queries, top_k=9)
    od, os_ = oracle.search(queries, top_k=9)
    np.testing.assert_allclose(ds, os_, rtol=1e-5, atol=1e-6)


def test_gather_add_rows_doc_pad_quantum():
    """doc_pad is the kernel's true padding quantum: parity holds past the
    262144-doc block boundary and the quantum stays close to d (the old
    fixed cb=256 split padded to 256-tile multiples — up to 262143 wasted
    columns)."""
    from bm25_tpu.ops.gather_rows import doc_pad

    assert doc_pad(1000) == 1024           # 1024-quantum below the cap
    assert doc_pad(262144) == 262144
    big = doc_pad(300000)
    assert big >= 300000 and big - 300000 < 4096  # balanced, not 524288

    rng = np.random.default_rng(2)
    v, d, q, t = 5, 262144 + 640, 2, 3
    table = jnp.asarray(rng.random((v, d), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, v, (q, t)).astype(np.int32))
    a = np.asarray(gather_add_rows(table, ids, "lax"))
    b = np.asarray(gather_add_rows(table, ids, "pallas"))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_gather_add_rows_degenerate_shapes_are_zero():
    """(Q, 0) ids never launch the kernel grid; the output must be zeros
    (regression: uninitialized memory), matching the lax path."""
    table = jnp.asarray(np.arange(8, dtype=np.float32).reshape(2, 4))
    for shape in [(3, 0), (0, 2)]:
        ids = jnp.zeros(shape, jnp.int32)
        out = np.asarray(gather_add_rows(table, ids, "pallas"))
        assert out.shape == (shape[0], 4)
        np.testing.assert_array_equal(out, 0)

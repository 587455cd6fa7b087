"""Incremental updates: delta segment, tombstones, compaction.

Pins the score-consistency contract of bm25_tpu/index/updates.py: between
compactions everything scores under the base-snapshot statistics (a delta
doc identical to a base doc scores identically), deletes never surface,
and compaction is bit-identical to a fresh fit of the live corpus.
"""

import numpy as np
import pytest

from bm25_tpu.index.updates import UpdatableEngine, UpdatableRetriever
from bm25_tpu.reference import ReferenceEngine
from bm25_tpu.scoring import BM25Params, build_scored_index


def _corpus(n=40, seed=0, vocab=30):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    return [
        " ".join(rng.choice(words, size=rng.integers(3, 12)))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def base_retriever():
    return UpdatableRetriever.fit(_corpus(), engine_mode="sparse")


def _fresh(texts, **kw):
    return UpdatableRetriever.fit(list(texts), **kw)


# -- engine-level ----------------------------------------------------------


def test_noop_wrapper_matches_base():
    """With no adds/deletes the wrapper is transparent."""
    docs_tok = [np.array([0, 1, 2], np.int32), np.array([1, 1, 3], np.int32),
                np.array([2, 4], np.int32)]
    idx = build_scored_index(docs_tok, vocab_size=5)
    base = ReferenceEngine.from_scored_index(idx)
    upd = UpdatableEngine(base, idx)
    q = np.array([[1, 2, -1]], np.int32)
    d0, s0 = base.search(q, top_k=3)
    d1, s1 = upd.search(q, top_k=3)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(s0, s1)


def test_added_identical_doc_scores_identically():
    """Frozen-stats delta scoring: a clone of a base doc gets the SAME
    score (same tf, same dl_norm, same idf snapshot) — exactness pin."""
    docs_tok = [np.array([0, 1, 2, 3], np.int32),
                np.array([1, 1, 4], np.int32),
                np.array([2, 0, 0, 4], np.int32)]
    idx = build_scored_index(docs_tok, vocab_size=5)
    upd = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)
    new_ids = upd.add([docs_tok[0].copy()])
    assert list(new_ids) == [3]
    q = np.array([[0, 1, 2, 3]], np.int32)
    docs, scores = upd.search(q, top_k=4)
    # clone ties the original exactly; tie contract -> original (id 0) first
    row = {int(d): float(s) for d, s in zip(docs[0], scores[0])}
    assert row[0] == row[3]
    assert list(docs[0][:2]) == [0, 3]


@pytest.mark.parametrize("method", ["lucene", "bm25+", "bm25l"])
def test_added_doc_clone_exact_all_methods(method):
    docs_tok = [np.array([0, 1, 2], np.int32), np.array([3, 3, 1], np.int32)]
    idx = build_scored_index(docs_tok, vocab_size=4,
                             params=BM25Params(method=method))
    upd = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)
    upd.add([docs_tok[1].copy()])
    q = np.array([[1, 3, -1]], np.int32)
    docs, scores = upd.search(q, top_k=3)
    row = {int(d): float(s) for d, s in zip(docs[0], scores[0])}
    assert row[1] == pytest.approx(row[2], abs=0), (
        "clone of doc 1 (now doc 2) must score bit-identically"
    )


def test_new_term_only_matches_delta_docs():
    docs_tok = [np.array([0, 1], np.int32), np.array([1, 2], np.int32)]
    idx = build_scored_index(docs_tok, vocab_size=3)
    upd = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)
    # new term id 3 (beyond base vocab 3)
    upd.add([np.array([3, 3, 0], np.int32)])
    assert upd.vocab_size == 4
    q = np.array([[3]], np.int32)
    docs, scores = upd.search(q, top_k=3)
    assert docs[0][0] == 2 and scores[0][0] > 0
    # base docs score 0 for the new term; they fill remaining slots by id
    assert list(docs[0][1:]) == [0, 1]
    assert scores[0][1] == 0.0


def test_delete_never_surfaces_and_overfetch_stays_exact():
    docs_tok = [np.array([0], np.int32) for _ in range(10)]
    idx = build_scored_index(docs_tok, vocab_size=1)
    upd = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)
    q = np.array([[0]], np.int32)
    # all docs identical -> order by id; delete the first three
    assert upd.delete([0, 1, 2]) == 3
    docs, scores = upd.search(q, top_k=5)
    assert list(docs[0]) == [3, 4, 5, 6, 7]
    assert upd.live_docs == 7
    # deleting again is idempotent
    assert upd.delete([2]) == 0


def test_delete_delta_doc():
    docs_tok = [np.array([0, 1], np.int32)]
    idx = build_scored_index(docs_tok, vocab_size=2)
    upd = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)
    ids = upd.add([np.array([0], np.int32), np.array([0], np.int32)])
    upd.delete([int(ids[0])])
    docs, _ = upd.search(np.array([[0]], np.int32), top_k=3)
    assert int(ids[0]) not in docs[0]
    assert upd.deleted_docs == 1 and upd.delta_docs == 2


def test_k_clamped_to_live_corpus():
    docs_tok = [np.array([0], np.int32) for _ in range(4)]
    idx = build_scored_index(docs_tok, vocab_size=1)
    upd = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)
    upd.delete([1])
    docs, scores = upd.search(np.array([[0]], np.int32), top_k=100)
    assert docs.shape == (1, 3) and scores.shape == (1, 3)


def test_out_of_range_ids_score_as_oov():
    """Token ids beyond the searchable vocab clamp to OOV (zero), never
    raise: under concurrent updates the engine's vocab can lag a racing
    add's tokenization, and a FAILED add leaves grown vocab terms behind
    permanently — neither may poison later searches."""
    docs_tok = [np.array([0], np.int32)]
    idx = build_scored_index(docs_tok, vocab_size=2)
    upd = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)
    docs, scores = upd.search(np.array([[5]], np.int32), top_k=1)
    assert scores[0, 0] == 0.0  # OOV contributes nothing
    d2, s2 = upd.search(np.array([[0, 5]], np.int32), top_k=1)
    d1, s1 = upd.search(np.array([[0, -1]], np.int32), top_k=1)
    np.testing.assert_array_equal(s2, s1)  # clamp == explicit pad
    # deletes of out-of-range doc ids are still caller bugs
    with pytest.raises(ValueError, match="out of range"):
        upd.delete([7])


def test_weighted_search_spans_segments():
    docs_tok = [np.array([0, 1], np.int32), np.array([1, 1], np.int32)]
    idx = build_scored_index(docs_tok, vocab_size=2)
    upd = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)
    upd.add([np.array([0, 0], np.int32)])
    q = np.array([[0, 1]], np.int32)
    w = np.array([[10.0, 0.1]], np.float32)
    docs, scores = upd.search(q, top_k=3, weights=w)
    assert docs[0][0] == 2  # double-0 delta doc wins under weight 10 on id 0
    assert scores.shape == (1, 3)


# -- retriever-level -------------------------------------------------------


def test_add_then_retrieve_text(base_retriever):
    r = _fresh(_corpus(12, seed=3), engine_mode="sparse")
    ids = r.add_documents(["a brand zyqqx document about zyqqx"])
    assert len(ids) == 1
    docs, scores = r.retrieve(["zyqqx"], k=3)
    assert docs[0][0] == ids[0] and scores[0][0] > 0


def test_compact_matches_fresh_fit():
    """After compact(), index arrays are bit-identical to a fresh fit of
    the live corpus — the central exactness guarantee."""
    texts = _corpus(15, seed=5)
    r = _fresh(texts, engine_mode="sparse")
    added = ["new shiny doc about plasma", "another plasma physics doc"]
    r.add_documents(added)
    r.delete_documents([2, 7])
    remap = r.compact()
    live_texts = [t for i, t in enumerate(texts) if i not in (2, 7)] + added
    fresh = _fresh(live_texts, engine_mode="sparse")
    np.testing.assert_array_equal(r.index.indptr, fresh.index.indptr)
    np.testing.assert_array_equal(r.index.indices, fresh.index.indices)
    np.testing.assert_array_equal(r.index.data, fresh.index.data)
    assert r.vocab == fresh.vocab
    # remap: deleted -> -1, survivors -> compacted positions
    assert remap[2] == -1 and remap[7] == -1
    assert remap[0] == 0 and remap[3] == 2
    # post-compaction retrieval equals the fresh retriever's
    q = ["plasma physics"]
    d0, s0 = r.retrieve(q, k=5)
    d1, s1 = fresh.retrieve(q, k=5)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(s0, s1)


def test_auto_compaction_on_add():
    r = _fresh(_corpus(10, seed=8), engine_mode="sparse",
               max_delta_docs=2)
    ids = r.add_documents(["alpha doc one", "alpha doc two", "alpha three"])
    # threshold tripped -> compacted: ids are post-compaction, delta empty
    assert r.engine.delta_docs == 0
    assert list(ids) == [10, 11, 12]
    docs, _ = r.retrieve(["alpha"], k=3)
    assert set(map(int, docs[0])) == {10, 11, 12}


def test_auto_compaction_on_delete():
    r = _fresh(_corpus(10, seed=9), engine_mode="sparse",
               max_deleted_frac=0.15)
    r.delete_documents([0, 1])  # 20% > 15% -> compacts
    assert r.engine.deleted_docs == 0 and r.engine.num_docs == 8


def test_save_compacts_and_roundtrips(tmp_path):
    from bm25_tpu.retriever import Retriever

    r = _fresh(_corpus(8, seed=11), engine_mode="sparse")
    r.add_documents(["roundtrip target doc qwyx"])
    r.delete_documents([1])
    out = tmp_path / "upd_idx"
    r.save(str(out))
    r2 = Retriever.load(str(out), engine_mode="sparse")
    d, s = r2.retrieve(["qwyx"], k=1)
    assert s[0][0] > 0
    assert r2.text(int(d[0][0])).endswith("qwyx")


def test_compact_refuses_empty_corpus():
    r = _fresh(["only doc"], engine_mode="sparse")
    r.max_deleted_frac = 10.0  # keep auto-compaction out of the way
    r.delete_documents([0])
    with pytest.raises(ValueError, match="empty"):
        r.compact()


def test_device_engine_base(base_retriever):
    """The wrapper over a real device engine (sparse, on the test mesh)."""
    r = base_retriever
    ids = r.add_documents(["tpu kernels and sharded meshes zzremarkable"])
    docs, scores = r.retrieve(["zzremarkable kernels"], k=5)
    assert docs[0][0] == ids[0]
    # oracle cross-check on the base-only part of a query
    q_ids = r.tokenizer.tokenize_queries(["kernels"], r.vocab)
    base_oracle = ReferenceEngine.from_scored_index(r.index)
    q_base = np.where(q_ids >= r.index.vocab_size, -1, q_ids)
    d0, s0 = base_oracle.search(q_base, top_k=3)
    d1, s1 = r.engine.search(q_ids, top_k=3)
    # delta doc contains 'kernels' too; drop it to compare base ordering
    live = [i for i, d in enumerate(d1[0]) if d < r.index.num_docs]
    np.testing.assert_array_equal(d1[0][live][:2], d0[0][:2])


# -- UpdateLog (write-ahead log) ------------------------------------------


def test_update_log_roundtrip_and_reset(tmp_path):
    from bm25_tpu.index.updates import UpdateLog

    log = UpdateLog(str(tmp_path))
    assert log.read() == []  # absent file
    assert log.read_pending() == []
    log.append({"op": "add", "docs": ["héllo wörld"]})  # non-ASCII intact
    log.append({"op": "delete", "doc_ids": [1, 2]})
    log.append({"op": "compact"})
    # the first append leads with a base-generation signature record
    assert UpdateLog(str(tmp_path)).read_pending() == [
        {"op": "add", "docs": ["héllo wörld"]},
        {"op": "delete", "doc_ids": [1, 2]},
        {"op": "compact"},
    ]
    log.reset()
    assert UpdateLog(str(tmp_path)).read_pending() == []
    log.append({"op": "compact"})  # appendable after a reset
    assert UpdateLog(str(tmp_path)).read_pending() == [{"op": "compact"}]
    log.close()


def test_update_log_base_generation_fencing(tmp_path):
    """Records logged against one base generation must never replay
    against another (a persisted compact that crashed before its log
    reset, or an out-of-band rebuild): read_pending discards them."""
    import warnings

    import numpy as np

    from bm25_tpu.index.updates import UpdateLog

    # a stand-in base artifact the signature covers
    np.save(tmp_path / "data.csc.index.npy", np.arange(4, dtype=np.float32))
    log = UpdateLog(str(tmp_path))
    log.append({"op": "add", "docs": ["pending doc"]})
    log.close()
    assert UpdateLog(str(tmp_path)).read_pending() == [
        {"op": "add", "docs": ["pending doc"]}
    ]
    # the base changes under the log (rewrite the artifact)
    np.save(tmp_path / "data.csc.index.npy",
            np.arange(8, dtype=np.float32))
    fresh = UpdateLog(str(tmp_path))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert fresh.read_pending() == []
    assert any("base artifacts changed" in str(x.message) for x in w)
    # the discard also reset the log to the NEW generation
    assert UpdateLog(str(tmp_path)).read_pending() == []


def test_update_log_corrupt_middle_raises(tmp_path):
    """Garbage FOLLOWED by valid records is a hole, not a torn tail —
    replaying around it would corrupt state, so it must refuse."""
    import pytest

    from bm25_tpu.index.updates import UpdateLog

    log = UpdateLog(str(tmp_path))
    with open(log.path, "w", encoding="utf-8") as f:
        f.write('{"op": "compact"}\n')
        f.write("not json at all\n")
        f.write('{"op": "delete", "doc_ids": [0]}\n')
    with pytest.raises(ValueError, match="line 2"):
        log.read()


def test_update_log_non_op_record_rejected(tmp_path):
    """A valid-JSON line that isn't an op object (e.g. a stray list) at the
    tail is treated as torn; mid-log it's corruption."""
    import warnings

    from bm25_tpu.index.updates import UpdateLog

    log = UpdateLog(str(tmp_path))
    with open(log.path, "w", encoding="utf-8") as f:
        f.write('{"op": "compact"}\n')
        f.write("[1, 2, 3]\n")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert log.read() == [{"op": "compact"}]
    assert any("torn" in str(x.message) for x in w)


def test_update_log_append_after_torn_tail(tmp_path):
    """Direct append on a log whose final line is torn garbage must cut
    the torn bytes first — otherwise the new record glues onto them and
    the NEXT restart refuses the whole log (acked ops unrecoverable)."""
    import warnings

    from bm25_tpu.index.updates import UpdateLog

    log = UpdateLog(str(tmp_path))
    log.append({"op": "compact"})
    log.close()
    with open(log.path, "a", encoding="utf-8") as f:
        f.write('{"op": "add", "docs": ["never ack')  # crash mid-append
    fresh = UpdateLog(str(tmp_path))
    fresh.append({"op": "delete", "doc_ids": [0]})  # no read_pending first
    fresh.close()
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # clean log: no torn warning
        assert UpdateLog(str(tmp_path)).read_pending() == [
            {"op": "compact"},
            {"op": "delete", "doc_ids": [0]},
        ]


def test_update_log_append_after_newline_lost_tail(tmp_path):
    """A crash that lost only the final newline leaves a PARSEABLE tail —
    read() replays such a record, so direct append must terminate it in
    place (not truncate it) to keep the logical log unchanged."""
    import warnings

    from bm25_tpu.index.updates import UpdateLog

    log = UpdateLog(str(tmp_path))
    log.append({"op": "compact"})
    log.close()
    with open(log.path, "a", encoding="utf-8") as f:
        f.write('{"op": "add", "docs": ["acked doc"]}')  # no newline
    fresh = UpdateLog(str(tmp_path))
    fresh.append({"op": "delete", "doc_ids": [1]})
    fresh.close()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert UpdateLog(str(tmp_path)).read_pending() == [
            {"op": "compact"},
            {"op": "add", "docs": ["acked doc"]},
            {"op": "delete", "doc_ids": [1]},
        ]


def test_update_log_read_pending_truncates_torn_bytes(tmp_path):
    """read_pending doesn't just tolerate a torn tail — it physically
    removes the bytes so later appends start on a clean line."""
    import warnings

    from bm25_tpu.index.updates import UpdateLog

    log = UpdateLog(str(tmp_path))
    log.append({"op": "compact"})
    log.close()
    with open(log.path, "a", encoding="utf-8") as f:
        f.write('{"op": "add", "docs": ["never ack')
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert UpdateLog(str(tmp_path)).read_pending() == [{"op": "compact"}]
    assert any("torn" in str(x.message) for x in w)
    with open(log.path, "rb") as f:
        data = f.read()
    assert b"never ack" not in data
    assert data.endswith(b"\n")


# -- composition with the sharded engines (CPU mesh) ------------------------


def test_updatable_over_sharded_sparse_engine():
    """UpdatableEngine wraps a doc-sharded device engine: base scores come
    off the mesh, delta/tombstone merging on host — add/delete/search all
    follow the single-chip contract."""
    texts = _corpus(n=48, seed=3)
    r = _fresh(texts, engine_mode="sharded_sparse")
    single = _fresh(texts, engine_mode="sparse")

    new_doc = "sharded zzshardmark doc about meshes"
    ids = r.add_documents([new_doc])
    ids1 = single.add_documents([new_doc])
    np.testing.assert_array_equal(ids, ids1)

    r.delete_documents([3])
    single.delete_documents([3])

    q = ["zzshardmark meshes", "w1 w2 w3"]
    d0, s0 = r.retrieve(q, k=8)
    d1, s1 = single.retrieve(q, k=8)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_allclose(s0, s1, rtol=2e-5, atol=2e-6)
    assert d0[0][0] == ids[0]  # the added doc tops its marker query
    assert 3 not in set(np.asarray(d0).ravel().tolist())

    # compaction over the sharded base rebuilds and stays oracle-exact
    remap = r.compact()
    single.compact()
    d2, s2 = r.retrieve(q, k=8)
    d3, s3 = single.retrieve(q, k=8)
    np.testing.assert_array_equal(d2, d3)
    np.testing.assert_allclose(s2, s3, rtol=2e-5, atol=2e-6)
    assert d2[0][0] == remap[ids[0]]


def test_delta_incremental_matches_single_batch_bitwise():
    """LSM layout invariant: any partition of the same docs into add
    batches produces bit-identical scores (blocks hold final frozen-idf
    values; per-doc sums take the same per-token order), including new
    terms whose df only settles at the end, weighted and unweighted."""
    from bm25_tpu.index.updates import DeltaSegment, StatsSnapshot

    rng = np.random.default_rng(7)
    vocab = 64
    base_tok = [rng.integers(0, vocab, size=rng.integers(3, 12)).astype(np.int32)
                for _ in range(30)]
    idx = build_scored_index(base_tok, vocab_size=vocab,
                             params=BM25Params(method="bm25+"))
    stats = StatsSnapshot.from_index(idx)
    # delta docs mixing base-vocab and new terms (ids 64..79)
    docs = [np.concatenate([
        rng.integers(0, vocab, size=rng.integers(2, 10)),
        rng.integers(vocab, vocab + 16, size=rng.integers(0, 4)),
    ]).astype(np.int32) for _ in range(200)]

    one = DeltaSegment(stats, vocab)
    one.add([d.copy() for d in docs])

    inc = DeltaSegment(stats, vocab)
    i = 0
    while i < len(docs):
        b = int(rng.integers(1, 17))
        inc.add([d.copy() for d in docs[i:i + b]])
        i += b
    assert len(inc._blocks) < 8  # geometric merge bounds the block count

    q = np.concatenate([
        rng.integers(-1, vocab, size=(16, 6)),
        rng.integers(vocab, vocab + 16, size=(16, 2)),
    ], axis=1).astype(np.int32)
    np.testing.assert_array_equal(one.score_all(q), inc.score_all(q))
    w = rng.uniform(0.1, 3.0, size=q.shape).astype(np.float32)
    np.testing.assert_array_equal(one.score_all(q, w), inc.score_all(q, w))
    np.testing.assert_array_equal(one._token_offsets, inc._token_offsets)


def test_doc_mask_composes_with_tombstones_and_delta():
    """Filtered search over an updatable engine: the mask spans base +
    delta global ids, composes with tombstones, and shortfalls pad -1."""
    docs_tok = [np.array([0, 1, 2], np.int32), np.array([1, 2], np.int32),
                np.array([0, 2], np.int32)]
    idx = build_scored_index(docs_tok, vocab_size=3)
    upd = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)
    upd.add([np.array([0, 1], np.int32), np.array([2, 2], np.int32)])  # 3, 4
    upd.delete([1])
    q = np.array([[0, 1, 2]], np.int32)

    # mask allows base 0 (live), base 1 (tombstoned!), delta 4
    mask = np.array([True, True, False, False, True])
    docs, scores = upd.search(q, top_k=5, doc_mask=mask)
    assert docs.shape[1] == 4  # k clamps to the live count (5 - 1 tomb)
    assert set(docs[0][docs[0] >= 0].tolist()) == {0, 4}  # 1 stays deleted
    n_real = int((docs[0] >= 0).sum())
    assert list(docs[0][n_real:]) == [-1] * (docs.shape[1] - n_real)
    assert (scores[0][n_real:] == 0.0).all()

    # a SHORT mask (stale num_docs snapshot) pads False — newer docs are
    # ineligible, not an error (racing-add tolerance); a too-LONG mask
    # is structurally wrong and raises
    docs, _ = upd.search(q, top_k=3, doc_mask=np.ones(3, bool))
    real = docs[0][docs[0] >= 0]
    assert set(real.tolist()) <= {0, 2}  # base-only (1 tombstoned)
    with pytest.raises(ValueError, match="doc_mask shape"):
        upd.search(q, top_k=3, doc_mask=np.ones(9, bool))

    # delta-only allowlist: results come purely from the delta segment
    only_delta = np.zeros(5, bool)
    only_delta[3] = True
    docs, scores = upd.search(q, top_k=2, doc_mask=only_delta)
    assert docs[0][0] == 3 and scores[0][0] > 0
    assert docs[0][1] == -1

    # parity with an unmasked search over an engine where the same docs
    # are deleted instead
    upd2 = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)
    upd2.add([np.array([0, 1], np.int32), np.array([2, 2], np.int32)])
    upd2.delete([1, 2, 3])
    d2, s2 = upd2.search(q, top_k=2)
    mask_equiv = np.array([True, False, False, False, True])
    d1, s1 = upd.search(q, top_k=2, doc_mask=mask_equiv)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_retriever_concurrent_add_and_retrieve_text_alignment():
    """Concurrent add_documents + retrieve(return_text=True) must never
    IndexError and every returned id's text must carry its own marker:
    texts publish BEFORE ids and mutators serialize on a lock (unlocked,
    two adds could interleave corpus.extend/engine.add in different
    orders, permanently misaligning ids and texts)."""
    import threading

    from bm25_tpu.index.updates import UpdatableRetriever

    base = [f"seed document number {i} alpha beta" for i in range(4)]
    r = UpdatableRetriever.fit(base, engine_mode="dense")
    errors: list = []
    stop = threading.Event()

    def adder(tid):
        try:
            for j in range(25):
                tok = f"marker{tid}x{j}"
                r.add_documents([f"{tok} fresh content {tid} {j}"])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def reader():
        try:
            while not stop.is_set():
                docs, scores, texts = r.retrieve(
                    ["alpha beta"], k=3, return_text=True
                )
                assert len(texts[0]) == 3
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=adder, args=(t,)) for t in range(3)]
    readers = [threading.Thread(target=reader) for _ in range(2)]
    for t in readers + threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    for t in readers:
        t.join()
    assert not errors, errors
    # every added id resolves to a text containing its own marker
    for tid in range(3):
        for j in range(25):
            tok = f"marker{tid}x{j}"
            docs, scores = r.retrieve([tok], k=1)
            assert scores[0][0] > 0
            assert tok in r.text(int(docs[0][0]))


def test_fit_engine_kwargs_shape_initial_engine():
    """engine_kwargs apply to the INITIAL engine, not only post-compaction
    rebuilds (regression: score precision silently changed at the first
    compact)."""
    r = UpdatableRetriever.fit(_corpus(8), engine_mode="sparse",
                               engine_kwargs={"score_dtype": "bfloat16"})
    assert r.engine.base.score_dtype == "bfloat16"
    r.add_documents(["zebra quagga yak"])
    r.compact()
    assert r.engine.base.score_dtype == "bfloat16"


def test_delete_everything_commits_without_raising():
    """Deleting every doc must not raise out of the auto-compaction hook:
    the tombstones are already committed and compaction (an optimization)
    simply holds until something is live again."""
    r = UpdatableRetriever.fit(_corpus(4), engine_mode="sparse",
                               max_deleted_frac=0.25)
    n = r.delete_documents(list(range(r.engine.num_docs)))
    assert n == 4
    assert not r.engine.live_mask().any()
    # recovery: a later add works and compaction re-arms
    ids = r.add_documents(["phoenix rises again"])
    docs, scores, texts = r.retrieve(["phoenix"], k=1, return_text=True)
    assert texts[0][0] == "phoenix rises again"


def test_short_doc_mask_rejected_below_base_length():
    """Masks shorter than the base segment are stale/mismatched, not the
    bounded concurrent-add race — must raise, not silently empty."""
    r = UpdatableRetriever.fit(_corpus(8), engine_mode="sparse")
    with pytest.raises(ValueError, match="doc_mask shape"):
        r.engine.search(np.array([[0]], np.int32), top_k=2,
                        doc_mask=np.ones(3, bool))
    # the legitimate window: mask built before a racing add
    r.add_documents(["newest doc text here"])
    docs, scores = r.engine.search(
        np.array([[0]], np.int32), top_k=2,
        doc_mask=np.ones(8, bool),  # snapshot before the add
    )
    assert (docs < 8).all() or (docs == -1).any()


def test_weights_as_list_with_delta_segment():
    """Non-ndarray weights normalize through the shared validator before
    reaching DeltaSegment.score_all (regression: TypeError on boolean
    indexing a list)."""
    docs_tok = [np.array([0, 1], np.int32), np.array([1, 1], np.int32)]
    idx = build_scored_index(docs_tok, vocab_size=2)
    upd = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)
    upd.add([np.array([0, 0], np.int32)])
    docs, scores = upd.search(np.array([[0, 1]], np.int32), top_k=3,
                              weights=[[10.0, 0.1]])
    assert docs[0][0] == 2


def test_streaming_spill_file_removed_after_finalize(tmp_path):
    from bm25_tpu.index.streaming import StreamingIndexBuilder

    b = StreamingIndexBuilder(spill_dir=str(tmp_path),
                              spill_threshold_bytes=64)  # force spill cycles
    b.add(["alpha beta gamma delta"] * 50)
    b.add(["epsilon zeta eta theta"] * 50)
    index, stats = b.finalize()
    assert index.num_docs == 100
    leftovers = [p for p in tmp_path.iterdir() if p.name.startswith("tokens.")]
    assert leftovers == []


def test_updatable_over_sharded_base_matches_reference_base():
    """The docstring's 'wraps any single-chip or sharded engine' claim,
    exercised: an UpdatableEngine over a ShardedSparseEngine (8-device CPU
    mesh) must match one over the host oracle through adds, deletes, a
    doc_mask, and weights."""
    from bm25_tpu.parallel.mesh import make_mesh
    from bm25_tpu.parallel.sharded_engine import ShardedSparseEngine

    rng = np.random.default_rng(5)
    docs_tok = [
        rng.integers(0, 64, size=rng.integers(3, 12)).astype(np.int32)
        for _ in range(96)
    ]
    idx = build_scored_index(docs_tok, vocab_size=64)
    mesh = make_mesh(8, data=2)
    upd_s = UpdatableEngine(
        ShardedSparseEngine.from_scored_index(idx, mesh=mesh), idx)
    upd_r = UpdatableEngine(ReferenceEngine.from_scored_index(idx), idx)

    q = rng.integers(-1, 64, size=(6, 5)).astype(np.int32)

    def check(**kw):
        ds, ss = upd_s.search(q, top_k=10, **kw)
        dr, sr = upd_r.search(q, top_k=10, **kw)
        # the sharded base's f32 accumulation order differs from the
        # oracle's at the ~1e-6 level, so a delta doc that exactly ties a
        # base doc can legitimately swap positions (the known boundary-tie
        # class) — require score-sequence equality and that any doc-set
        # difference sits at the k-th score boundary
        np.testing.assert_allclose(ss, sr, atol=2e-4)
        for a_d, a_s, b_d, b_s in zip(ds, ss, dr, sr):
            only = set(a_d.tolist()) ^ set(b_d.tolist())
            only.discard(-1)
            kth = min(a_s[-1], b_s[-1])
            for d in only:
                row_s, row_d = (a_s, a_d) if d in a_d else (b_s, b_d)
                sc = float(row_s[list(row_d).index(d)])
                assert abs(sc - kth) <= 2e-4, (d, sc, kth)

    check()
    added = [rng.integers(0, 80, size=7).astype(np.int32) for _ in range(5)]
    ids_s = upd_s.add(added)
    ids_r = upd_r.add(added)
    np.testing.assert_array_equal(ids_s, ids_r)
    check()
    upd_s.delete([1, 3, int(ids_s[0])])
    upd_r.delete([1, 3, int(ids_r[0])])
    check()
    mask = np.ones(upd_s.num_docs, bool)
    mask[rng.choice(upd_s.num_docs, 30, replace=False)] = False
    check(doc_mask=mask)
    w = np.abs(rng.standard_normal(q.shape)).astype(np.float32)
    w[q < 0] = 0.0
    check(weights=w)

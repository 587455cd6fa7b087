"""Sparse device engine: doc-major padded postings (ELL) + blockwise top-k.

Large-corpus mode (V x D dense is out of HBM budget).  The CSC index is
re-laid out doc-major: each document's distinct (token, score) pairs are
padded to its length-bucket's width, giving dense ``tok[rows, L]`` int32 and
``val[rows, L]`` float32 tiles — the TPU-friendly answer to SURVEY.md's
"irregular postings on a dense-tile machine" (length bucketing bounds the
padding waste; memory stays O(nnz)).

Scoring a query is a membership-count row sum:
``score[d] = sum_l val[d,l] * #{t : ids[q,t] == tok[d,l]}`` — pure VPU
compare/accumulate with static shapes, no scatter, no dynamic shapes, and
occurrence-count semantics matching the reference's per-column gather+sum
(``/root/reference/bm25_native.py:152``).

Query path (one jitted dispatch): per bucket, the fused Pallas scoring
kernel (ops.ell_score, slot-major layout) produces a (Q, rows) score tile,
a hierarchical top-k (ops.topk.select_top_k) selects local
candidates, and all buckets' candidates merge with one final stable top-k —
the streaming generalization of the reference's two-stage GPU top-k
(``/root/reference/operations/topk.mojo:576-830``).

Docs are permuted by length bucketing, so positions map back to original
ids through a device-resident position->doc-id table; tie-breaking is
deterministic (stable in permuted position order) but not doc-id order —
the documented divergence of this engine (DenseEngine preserves it).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bm25_tpu.runtime.session import Session, get_session
from bm25_tpu.scoring import ScoredIndex
from bm25_tpu.utils.padding import next_multiple, next_pow2_at_least

NEG_INF = float("-inf")
PAD_TOK = -1  # never matches a query id (valid ids are >= 0)


# ---------------------------------------------------------------------------
# host-side layout
# ---------------------------------------------------------------------------


@dataclass
class EllBucket:
    tok: np.ndarray  # (rows_pad, L) int32, PAD_TOK padded
    val: np.ndarray  # (rows_pad, L) float32
    doc_ids: np.ndarray  # (rows_pad,) int32 original doc id; -1 for pad rows
    num_real: int


def build_ell_buckets(
    index: ScoredIndex,
    max_buckets: int = 4,
    row_align: int = 8,
    width_align: int = 8,
) -> list[EllBucket]:
    """Re-lay the CSC index doc-major with length bucketing (vectorized)."""
    csr = index.to_csc().tocsr()
    return build_ell_buckets_from_csr(
        csr, index.num_docs, max_buckets=max_buckets,
        row_align=row_align, width_align=width_align,
    )


def build_ell_buckets_from_csr(
    csr,
    num_docs: int,
    max_buckets: int = 4,
    row_align: int = 8,
    width_align: int = 8,
) -> list[EllBucket]:
    """ELL bucketing core over a (num_docs, V) CSR of scored postings."""
    csr.sort_indices()
    row_nnz = np.diff(csr.indptr)
    order = np.argsort(row_nnz, kind="stable")

    d = num_docs
    if d == 0:
        return []
    bounds = sorted(
        {int(q * d) for q in np.linspace(0, 1, max_buckets + 1)[1:]} | {d}
    )
    buckets: list[EllBucket] = []
    start = 0
    for end in bounds:
        if end <= start:
            continue
        rows = order[start:end]
        width = int(row_nnz[rows].max(initial=0))
        width = next_multiple(max(width, 1), width_align)
        n = len(rows)
        n_pad = next_multiple(n, row_align)
        tok = np.full((n_pad, width), PAD_TOK, dtype=np.int32)
        val = np.zeros((n_pad, width), dtype=np.float32)
        doc_ids = np.full((n_pad,), -1, dtype=np.int32)
        # vectorized fill: flat nnz of the selected rows -> (row, slot) coords
        nnz_sel = row_nnz[rows]
        starts = csr.indptr[rows]
        flat_rows = np.repeat(np.arange(n, dtype=np.int64), nnz_sel)
        slot = np.arange(len(flat_rows), dtype=np.int64) - np.repeat(
            np.cumsum(nnz_sel) - nnz_sel, nnz_sel
        )
        src = np.repeat(starts, nnz_sel) + slot
        tok[flat_rows, slot] = csr.indices[src]
        val[flat_rows, slot] = csr.data[src]
        doc_ids[:n] = rows
        buckets.append(EllBucket(tok=tok, val=val, doc_ids=doc_ids, num_real=n))
        start = end
    return buckets


# ---------------------------------------------------------------------------
# device query steps
# ---------------------------------------------------------------------------


def make_sparse_query_step(k: int, hot_h: int = 0):
    """Jittable single-dispatch query step over all ELL buckets.

    buckets: list of dicts with ``tokT (L_pad, rows)``, ``valT``, ``doc_ids
    (rows,)`` and optionally ``hotT (H, rows)`` device arrays.  Scoring is
    hot/cold split: the highest-DF tokens' contributions come from one MXU
    matmul of per-query hot-token counts against the dense hot sub-matrix,
    the long tail from the fused Pallas postings kernel; per bucket the sum
    feeds pad-row masking -> hierarchical local top-k, and all buckets'
    candidates merge with one final stable top-k (two-stage shape of
    ``/root/reference/operations/topk.mojo:576-830``).
    """

    def step(ids, buckets, offsets, hot_table):
        from bm25_tpu.ops.ell_score import ell_score
        from bm25_tpu.ops.topk import select_top_k

        valid = ids >= 0
        safe = jnp.where(valid, ids, 0)
        qoff = jnp.sum(
            jnp.where(valid, offsets[safe], jnp.zeros((), offsets.dtype)), axis=1
        )
        hot_counts = None
        if hot_h > 0:
            hot_ids = jnp.where(valid, hot_table[safe], -1)  # (Q, T)
            # one_hot(-1) is all-zero, so pads/cold tokens vanish; counts are
            # small integers, exactly representable in bf16
            hot_counts = jax.nn.one_hot(
                hot_ids, hot_h, dtype=jnp.bfloat16
            ).sum(axis=1)  # (Q, H)
        cand_s, cand_i = [], []
        for b in buckets:
            if cand_s:
                # chain each bucket on the previous bucket's candidates so
                # XLA schedules buckets sequentially — otherwise it keeps
                # every bucket's (Q, rows) score tile alive at once and OOMs
                # at ~10M docs (observed: 3x 4 GB HLO temps)
                ids_in, _ = lax.optimization_barrier((ids, cand_s[-1]))
            else:
                ids_in = ids
            scores = ell_score(ids_in, b["tokT"], b["valT"])  # (Q, rows)
            if hot_counts is not None:
                # split-precision matmul: hot scores are stored as bf16 high
                # + bf16 residual; two native single-pass MXU products with
                # exact-bf16 counts reconstruct ~f32 accuracy without relying
                # on the backend honoring precision=HIGHEST (the TPU default
                # f32 matmul is bf16 passes, ~1e-3 rel err — breaks top-k
                # parity at corpus scale)
                scores = (
                    scores
                    + jnp.dot(hot_counts, b["hotT"],
                              preferred_element_type=jnp.float32)
                    + jnp.dot(hot_counts, b["hotLo"],
                              preferred_element_type=jnp.float32)
                )
            did = b["doc_ids"]
            scores = jnp.where(did[None, :] >= 0, scores, NEG_INF)
            kk = min(k, scores.shape[1])
            s, pos = select_top_k(scores, kk)
            cand_s.append(s)
            cand_i.append(did[pos])
        cs = jnp.concatenate(cand_s, axis=1)
        ci = jnp.concatenate(cand_i, axis=1)
        kk = min(k, cs.shape[1])
        ms, mpos = lax.top_k(cs, kk)
        docs = jnp.take_along_axis(ci, mpos, axis=1)
        # pack (scores, docs) into one array: a single device->host fetch per
        # chunk.  Doc ids convert to f32 VALUES (exact below 2^24) — never
        # bitcast: int bit patterns of small ids are f32 denormals, which the
        # TPU transfer path flushes to zero (28% of ids corrupted in prod).
        return jnp.concatenate(
            [ms + qoff[:, None], docs.astype(jnp.float32)], axis=1
        )

    return step


def split_hot_cold(
    index: ScoredIndex, hot_tokens: int
) -> tuple[np.ndarray, "object", np.ndarray]:
    """Split the index by document frequency.

    Returns ``(hot_ids, cold_csr, hot_dense)``: the token ids of the top
    ``hot_tokens`` by DF, a CSR matrix of the remaining (cold) postings
    (token ids unchanged), and the dense (num_docs, H) float32 matrix of
    hot contributions in original doc order.
    """
    df = index.df()
    h = min(hot_tokens, index.vocab_size)
    hot_ids = np.sort(np.argsort(-df, kind="stable")[:h]).astype(np.int32)
    hot_rank = np.full(index.vocab_size, -1, dtype=np.int32)
    hot_rank[hot_ids] = np.arange(h, dtype=np.int32)

    csr = index.to_csc().tocsr()
    csr.sort_indices()
    is_hot = hot_rank[csr.indices] >= 0

    hot_dense = np.zeros((index.num_docs, h), dtype=np.float32)
    row_of = np.repeat(
        np.arange(index.num_docs, dtype=np.int64), np.diff(csr.indptr)
    )
    hot_dense[row_of[is_hot], hot_rank[csr.indices[is_hot]]] = csr.data[is_hot]

    import scipy.sparse as sp

    keep = ~is_hot
    counts = np.bincount(row_of[keep], minlength=index.num_docs)
    cold_indptr = np.zeros(index.num_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=cold_indptr[1:])
    cold_csr = sp.csr_matrix(
        (csr.data[keep], csr.indices[keep], cold_indptr),
        shape=csr.shape,
    )
    return hot_ids, cold_csr, hot_dense


@dataclass
class SparseEngine:
    """Device-resident padded-postings BM25 engine (large corpora)."""

    buckets: list  # dicts: tokT (L_pad, rows), valT, doc_ids, [hotT] arrays
    offsets: jax.Array  # (V+1,) float32 token offsets
    hot_table: jax.Array  # (V+1,) int32 token id -> hot rank or -1
    hot_h: int
    num_docs: int
    vocab_size: int
    session: Session
    vocab: dict[str, int] | None = None
    score_buffer_budget: int = 4 << 30
    # sub-batch size: chunks dispatch asynchronously, so device compute on
    # chunk i overlaps result transfer of chunk i-1; also pins the compiled
    # query-batch shape
    chunk_queries: int = 512
    # tail tier (candidate generation for low-DF tokens); None = disabled
    tail_docs: jax.Array | None = None  # (R, P) int32 doc ids, -1 pad
    tail_vals: jax.Array | None = None  # (R, P) float32 contributions
    tail_toks: jax.Array | None = None  # (R, P) int32 owning token ids
    tail_rows: jax.Array | None = None  # (V+1, C) int32 row ids, -1 pad
    tail_cap: int = 0  # max DF routed to the tail tier

    @classmethod
    def from_scored_index(
        cls,
        index: ScoredIndex,
        session: Session | None = None,
        max_buckets: int = 4,
        dtype=jnp.float32,
        hot_tokens: int = 512,
        hot_budget_bytes: int | None = None,
    ) -> "SparseEngine":
        from bm25_tpu.ops.ell_score import BLOCK_ROWS

        session = session or get_session()
        if index.num_docs >= 1 << 24:
            # doc ids ride back to the host as exact f32 values (packed
            # with the scores into one transfer); beyond 2^24 that loses
            # integer exactness — needs an unpacked result path first
            raise NotImplementedError(
                f"{index.num_docs} docs >= 2^24: packed doc-id transfer "
                "would be inexact; shard the corpus (ShardedSparseEngine) "
                "or split into multiple engines"
            )

        # cap the dense hot sub-matrix by its memory budget; the default
        # budget is the raw CSC footprint itself, bounding total device
        # memory at ~2.3x CSC (ELL ~1.25x + hot <=1x).  Hot entries cost
        # 4 bytes (bf16 high + bf16 residual).
        if hot_budget_bytes is None:
            hot_budget_bytes = index.data.nbytes + index.indices.nbytes + index.indptr.nbytes
        max_h = hot_budget_bytes // max(index.num_docs * 4, 1)
        h = int(min(hot_tokens, max_h, index.vocab_size))
        if h > 0:
            hot_ids, cold_csr, hot_dense = split_hot_cold(index, h)
            h = len(hot_ids)
            host_buckets = build_ell_buckets_from_csr(
                cold_csr, index.num_docs, max_buckets=max_buckets,
                row_align=BLOCK_ROWS,
            )
        else:
            hot_ids, hot_dense = np.zeros(0, np.int32), None
            host_buckets = build_ell_buckets(
                index, max_buckets=max_buckets, row_align=BLOCK_ROWS
            )

        v = index.vocab_size
        hot_table = np.full((v + 1,), -1, dtype=np.int32)
        if h > 0:
            hot_table[hot_ids] = np.arange(h, dtype=np.int32)

        dev_buckets = []
        for b in host_buckets:
            l_pad = next_multiple(b.tok.shape[1], 8)
            tok_t = np.full((l_pad, b.tok.shape[0]), PAD_TOK, dtype=np.int32)
            tok_t[: b.tok.shape[1]] = b.tok.T
            val_t = np.zeros((l_pad, b.val.shape[0]), dtype=np.float32)
            val_t[: b.val.shape[1]] = b.val.T
            entry = {
                "tokT": session.put(tok_t),
                "valT": session.put(val_t.astype(dtype)),
                "doc_ids": session.put(b.doc_ids),
            }
            if h > 0:
                # hot sub-matrix in this bucket's permuted row order, stored
                # as bf16 high + bf16 residual (same bytes as f32, see
                # make_sparse_query_step for why)
                hot_b = np.zeros((h, len(b.doc_ids)), dtype=np.float32)
                real = b.doc_ids >= 0
                hot_b[:, real] = hot_dense[b.doc_ids[real]].T
                hot_hi = hot_b.astype(jnp.bfloat16)
                hot_lo = (hot_b - hot_hi.astype(np.float32)).astype(jnp.bfloat16)
                entry["hotT"] = session.put(hot_hi)
                entry["hotLo"] = session.put(hot_lo)
            dev_buckets.append(entry)

        off_host = np.zeros((v + 1,), dtype=np.float32)
        if index.token_offsets is not None:
            off_host[:v] = index.token_offsets
        return cls(
            buckets=dev_buckets,
            offsets=session.put(off_host),
            hot_table=session.put(hot_table),
            hot_h=h,
            num_docs=index.num_docs,
            vocab_size=v,
            session=session,
            vocab=index.vocab,
        )

    # -- query path ----------------------------------------------------------

    @property
    def total_positions(self) -> int:
        return sum(b["tokT"].shape[1] for b in self.buckets)

    def _query_chunk(self, padded: np.ndarray, k: int):
        """One padded (Q_pad, T_pad) chunk -> packed (Q_pad, 2k) device array."""
        q_pad, t_pad = padded.shape
        shapes = tuple(
            (tuple(b["tokT"].shape)) for b in self.buckets
        )
        dtypes = tuple(
            str(b[key].dtype) for b in self.buckets for key in sorted(b)
        )
        fn = self.session.compile(
            ("sparse_query", k, self.hot_h, q_pad, t_pad, shapes, dtypes),
            lambda: jax.jit(make_sparse_query_step(k, self.hot_h)),
        )
        return fn(
            self.session.put(padded), self.buckets, self.offsets,
            self.hot_table,
        )

    def search(
        self, queries: np.ndarray, top_k: int = 100
    ) -> tuple[np.ndarray, np.ndarray]:
        queries = np.asarray(queries)
        if queries.ndim != 2 or not np.issubdtype(queries.dtype, np.integer):
            raise ValueError("queries must be a 2-D integer array of token ids")
        if queries.size and int(queries.max()) >= self.vocab_size:
            raise ValueError(
                f"max token id {int(queries.max())} out of range for vocab of "
                f"{self.vocab_size} tokens"
            )
        if len(queries) == 0:
            return np.zeros((0, 0), np.int32), np.zeros((0, 0), np.float32)
        k = min(top_k, self.num_docs)
        q_real, t_real = queries.shape
        # chunk queries so transient (Q, rows) score tiles fit the budget
        max_rows = max(b["tokT"].shape[1] for b in self.buckets)
        max_q = max(8, (self.score_buffer_budget // (4 * max_rows)) // 8 * 8)
        max_q = min(max_q, self.chunk_queries)
        out_docs, out_scores, futures = [], [], []
        for i in range(0, q_real, max_q):
            chunk = queries[i : i + max_q].astype(np.int32)
            cq = len(chunk)
            q_pad = next_multiple(cq, 8)
            t_pad = next_pow2_at_least(max(t_real, 8))
            padded = np.full((q_pad, t_pad), -1, dtype=np.int32)
            padded[:cq, :t_real] = chunk
            futures.append((cq, self._query_chunk(padded, k)))
        for cq, packed in futures:
            host = np.asarray(packed)[:cq]
            out_scores.append(host[:, :k])
            out_docs.append(host[:, k:].astype(np.int32))
        return np.concatenate(out_docs), np.concatenate(out_scores)

    def get_scores(self, query_ids) -> np.ndarray:
        ids = np.asarray(query_ids, dtype=np.int32).reshape(1, -1)
        docs, scores = self.search(ids, top_k=self.num_docs)
        out = np.zeros(self.num_docs, dtype=np.float32)
        out[docs[0]] = scores[0]
        return out

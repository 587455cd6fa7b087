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

Query path: every bucket scans its doc axis in superblocks, writing scores
into one global (Q, D_pad) buffer (donated across bucket calls, so it stays
device-resident); a single hierarchical block-max top-k
(ops.topk.top_k_blockwise) then selects candidates over the whole corpus —
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
from bm25_tpu.utils.padding import cdiv, next_multiple, next_pow2_at_least

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
    csr.sort_indices()
    row_nnz = np.diff(csr.indptr)
    order = np.argsort(row_nnz, kind="stable")

    d = index.num_docs
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


def _score_block(tok_blk, val_blk, ids, valid):
    """(B, L) postings vs (Q, T) ids -> (Q, B) scores.

    Scans the L (postings-slot) axis carrying only the (Q, B) accumulator;
    each step is a (Q, B, T) compare + T-reduction fused on the VPU — no
    (Q, B, L) intermediate materializes.
    """
    # doc pad slots hold PAD_TOK (-1); mask query pads to -2 so that a doc
    # pad slot can never match a query pad slot
    masked_ids = jnp.where(valid, ids, -2)

    def per_slot(acc, slot):
        tok_col, val_col = slot  # (B,), (B,)
        eq = masked_ids[:, None, :] == tok_col[None, :, None]  # (Q, B, T)
        cnt = jnp.sum(eq, axis=-1).astype(val_col.dtype)  # (Q, B)
        return acc + cnt * val_col[None, :], None

    q = ids.shape[0]
    b = tok_blk.shape[0]
    acc0 = jnp.zeros((q, b), dtype=jnp.float32)
    acc, _ = lax.scan(per_slot, acc0, (tok_blk.T, val_blk.T))
    return acc


def make_bucket_scorer(block_rows: int, offset: int):
    """Jittable: score one bucket into its [offset, offset+rows) slice of the
    global (Q, D_pad) score buffer (buffer donated by the caller)."""

    def step(tok, val, doc_ids, ids, buf):
        rows = tok.shape[0]
        nblocks = rows // block_rows
        valid = ids >= 0

        def body(b, blk):
            tok_blk = lax.dynamic_slice_in_dim(tok, blk * block_rows, block_rows)
            val_blk = lax.dynamic_slice_in_dim(val, blk * block_rows, block_rows)
            did_blk = lax.dynamic_slice_in_dim(
                doc_ids, blk * block_rows, block_rows
            )
            scores = _score_block(tok_blk, val_blk, ids, valid)
            scores = jnp.where(did_blk[None, :] >= 0, scores, NEG_INF)
            return (
                lax.dynamic_update_slice(b, scores, (0, offset + blk * block_rows)),
                None,
            )

        buf, _ = lax.scan(body, buf, jnp.arange(nblocks))
        return buf

    return step


def make_finalize(num_positions: int, k: int):
    """Jittable: global blockwise top-k over the score buffer + id mapping."""

    def fin(buf, pos_to_doc, offsets, ids):
        from bm25_tpu.ops.topk import top_k_blockwise

        valid = ids >= 0
        safe = jnp.where(valid, ids, 0)
        qoff = jnp.sum(
            jnp.where(valid, offsets[safe], jnp.zeros((), offsets.dtype)), axis=1
        )
        top_s, top_pos = top_k_blockwise(buf[:, :num_positions], k)
        top_docs = pos_to_doc[top_pos]
        return top_s + qoff[:, None], top_docs

    return fin


@dataclass
class SparseEngine:
    """Device-resident padded-postings BM25 engine (large corpora)."""

    buckets: list  # dicts: tok, val device arrays + host offset metadata
    pos_to_doc: jax.Array  # (D_pad_total,) int32
    bucket_doc_ids: list  # device (rows_pad,) per bucket
    offsets: jax.Array  # (V+1,) float32 token offsets
    num_docs: int
    vocab_size: int
    total_positions: int
    session: Session
    vocab: dict[str, int] | None = None
    block_rows: int = 32768
    score_buffer_budget: int = 4 << 30

    @classmethod
    def from_scored_index(
        cls,
        index: ScoredIndex,
        session: Session | None = None,
        max_buckets: int = 4,
        block_rows: int = 32768,
        dtype=jnp.float32,
    ) -> "SparseEngine":
        session = session or get_session()
        host_buckets = build_ell_buckets(index, max_buckets=max_buckets)
        dev_buckets = []
        bucket_doc_ids = []
        pos_to_doc_parts = []
        offset = 0
        for b in host_buckets:
            rows = b.tok.shape[0]
            dev_buckets.append(
                {
                    "tok": session.put(b.tok),
                    "val": session.put(b.val.astype(dtype)),
                    "offset": offset,
                    "rows": rows,
                }
            )
            bucket_doc_ids.append(session.put(b.doc_ids))
            pos_to_doc_parts.append(b.doc_ids)
            offset += rows
        v = index.vocab_size
        off_host = np.zeros((v + 1,), dtype=np.float32)
        if index.token_offsets is not None:
            off_host[:v] = index.token_offsets
        pos_to_doc = np.concatenate(pos_to_doc_parts) if pos_to_doc_parts else np.zeros(0, np.int32)
        return cls(
            buckets=dev_buckets,
            pos_to_doc=session.put(pos_to_doc.astype(np.int32)),
            bucket_doc_ids=bucket_doc_ids,
            offsets=session.put(off_host),
            num_docs=index.num_docs,
            vocab_size=v,
            total_positions=offset,
            session=session,
            vocab=index.vocab,
            block_rows=block_rows,
        )

    # -- query path ----------------------------------------------------------

    def _query_chunk(self, padded: np.ndarray, k: int):
        """One padded (Q_pad, T_pad) chunk -> (scores, docs) device arrays."""
        q_pad, t_pad = padded.shape
        d_pad = next_multiple(self.total_positions, 128)
        ids = self.session.put(padded)
        buf = jnp.full((q_pad, d_pad), NEG_INF, dtype=jnp.float32)
        for bi, b in enumerate(self.buckets):
            rows = b["rows"]
            block = min(self.block_rows, rows)
            while rows % block:
                block //= 2
            fn = self.session.compile(
                ("ell_score", bi, block, b["offset"], q_pad, t_pad,
                 tuple(b["tok"].shape)),
                lambda block=block, off=b["offset"]: jax.jit(
                    make_bucket_scorer(block, off), donate_argnums=(4,)
                ),
            )
            buf = fn(b["tok"], b["val"], self.bucket_doc_ids[bi], ids, buf)
        fin = self.session.compile(
            ("ell_finalize", self.total_positions, k, q_pad, t_pad, d_pad),
            lambda: jax.jit(make_finalize(self.total_positions, k)),
        )
        return fin(buf, self.pos_to_doc, self.offsets, ids)

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
        # chunk queries so the (Q, D_pad) score buffer fits the budget
        d_pad = next_multiple(self.total_positions, 128)
        max_q = max(8, (self.score_buffer_budget // (4 * d_pad)) // 8 * 8)
        out_docs, out_scores, futures = [], [], []
        for i in range(0, q_real, max_q):
            chunk = queries[i : i + max_q].astype(np.int32)
            cq = len(chunk)
            q_pad = next_multiple(cq, 8)
            t_pad = next_pow2_at_least(max(t_real, 1))
            padded = np.full((q_pad, t_pad), -1, dtype=np.int32)
            padded[:cq, :t_real] = chunk
            s, d = self._query_chunk(padded, k)
            futures.append((cq, s, d))
        for cq, s, d in futures:
            out_scores.append(np.asarray(s)[:cq])
            out_docs.append(np.asarray(d)[:cq])
        return np.concatenate(out_docs), np.concatenate(out_scores)

    def get_scores(self, query_ids) -> np.ndarray:
        ids = np.asarray(query_ids, dtype=np.int32).reshape(1, -1)
        docs, scores = self.search(ids, top_k=self.num_docs)
        out = np.zeros(self.num_docs, dtype=np.float32)
        out[docs[0]] = scores[0]
        return out

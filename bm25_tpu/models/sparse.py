"""Sparse device engine: doc-major padded postings (ELL) + streaming top-k.

Large-corpus mode (V x D dense is out of HBM budget).  The CSC index is
re-laid out doc-major: for each document, its distinct (token, score) pairs
are padded to the bucket width, giving dense ``tok[D_pad, L]`` int32 and
``val[D_pad, L]`` float32 tiles — the TPU-friendly answer to SURVEY.md's
"irregular postings on a dense-tile machine" (length-bucketing bounds the
padding waste; memory stays O(nnz)).

Scoring a query = membership-weighted row sum:
``score[d] = sum_l val[d,l] * [tok[d,l] in query]`` — pure VPU
compare/accumulate with static shapes, no scatter, no dynamic shapes.  The
doc axis is scanned in blocks with a running top-k merge (carry (Q,k)), the
streaming analogue of the reference's two-stage GPU top-k
(``/root/reference/operations/topk.mojo:576-830``), so the full (Q, D) score
matrix never materializes in HBM.

Docs are sorted by distinct-token count into length buckets; each bucket is
scored independently and candidates merge at the end.  Output ids map back
through the per-row original-doc-id table.
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
    tok: np.ndarray  # (D_pad, L) int32, PAD_TOK padded
    val: np.ndarray  # (D_pad, L) float32
    doc_ids: np.ndarray  # (D_pad,) int32 original doc id; -1 for pad rows
    num_real: int


def build_ell_buckets(
    index: ScoredIndex,
    max_buckets: int = 4,
    row_align: int = 8,
    width_align: int = 8,
) -> list[EllBucket]:
    """Re-lay the CSC index doc-major with length bucketing."""
    csr = index.to_csc().tocsr()
    csr.sort_indices()
    row_nnz = np.diff(csr.indptr)
    order = np.argsort(row_nnz, kind="stable")

    # bucket boundaries at quantiles of the sorted row lengths
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
        # merge tiny tail buckets into the same width class as neighbors is
        # handled implicitly by quantile dedup above
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
# device query step
# ---------------------------------------------------------------------------


def _score_block(tok_blk, val_blk, ids, valid):
    """(B, L) postings vs (Q, T) ids -> (Q, B) scores.

    Occurrence-count semantics: a token repeated in the query contributes
    once per occurrence, matching the reference's per-column gather+sum
    (``/root/reference/bm25_native.py:152`` sums a repeated column twice).

    Scans the L (postings-slot) axis carrying only the (Q, B) accumulator;
    each step is a (Q, B, T) compare + T-reduction that XLA fuses on the
    VPU — no (Q, B, L) intermediate ever materializes.
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


def make_ell_query_step(block_rows: int, k: int):
    """Build jittable (tok, val, doc_ids, ids, best_s, best_i) -> merged (Q,k).

    Scans the bucket's doc axis in blocks of ``block_rows``; carries the
    running (Q, k) candidate set and merges each block's scores into it
    (streaming two-stage top-k).
    """

    def step(tok, val, doc_ids, ids, best_s, best_i):
        d_pad = tok.shape[0]
        nblocks = d_pad // block_rows
        valid = ids >= 0

        def body(carry, blk):
            from bm25_tpu.ops.topk import top_k_blockwise

            bs, bi = carry
            tok_blk = lax.dynamic_slice_in_dim(tok, blk * block_rows, block_rows)
            val_blk = lax.dynamic_slice_in_dim(val, blk * block_rows, block_rows)
            did_blk = lax.dynamic_slice_in_dim(doc_ids, blk * block_rows, block_rows)
            scores = _score_block(tok_blk, val_blk, ids, valid)  # (Q, B)
            scores = jnp.where(did_blk[None, :] >= 0, scores, NEG_INF)
            # stage 1: block-local top-k candidates (hierarchical for big B)
            k_local = min(k, block_rows)
            ls, lpos = top_k_blockwise(scores, k_local)
            li = jnp.take_along_axis(
                jnp.broadcast_to(did_blk[None, :], scores.shape), lpos, axis=1
            )
            # stage 2: merge into the running candidate set
            cat_s = jnp.concatenate([bs, ls], axis=1)
            cat_i = jnp.concatenate([bi, li], axis=1)
            ns, pos = lax.top_k(cat_s, k)
            ni = jnp.take_along_axis(cat_i, pos, axis=1)
            return (ns, ni), None

        (best_s, best_i), _ = lax.scan(
            body, (best_s, best_i), jnp.arange(nblocks)
        )
        return best_s, best_i

    return step


@dataclass
class SparseEngine:
    """Device-resident padded-postings BM25 engine (large corpora)."""

    buckets: list  # list of dicts of device arrays
    offsets: jax.Array  # (V_pad,) float32 token offsets
    num_docs: int
    vocab_size: int
    session: Session
    vocab: dict[str, int] | None = None
    block_rows: int = 2048

    @classmethod
    def from_scored_index(
        cls,
        index: ScoredIndex,
        session: Session | None = None,
        max_buckets: int = 4,
        block_rows: int = 2048,
        dtype=jnp.float32,
    ) -> "SparseEngine":
        session = session or get_session()
        host_buckets = build_ell_buckets(index, max_buckets=max_buckets)
        dev_buckets = []
        for b in host_buckets:
            rows = next_multiple(b.tok.shape[0], min(block_rows, 8))
            dev_buckets.append(
                {
                    "tok": session.put(b.tok),
                    "val": session.put(b.val.astype(dtype)),
                    "doc_ids": session.put(b.doc_ids),
                    "num_real": b.num_real,
                }
            )
        v = index.vocab_size
        off_host = np.zeros((v + 1,), dtype=np.float32)
        if index.token_offsets is not None:
            off_host[:v] = index.token_offsets
        return cls(
            buckets=dev_buckets,
            offsets=session.put(off_host),
            num_docs=index.num_docs,
            vocab_size=v,
            session=session,
            vocab=index.vocab,
            block_rows=block_rows,
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
        q_pad = next_multiple(q_real, 8)
        t_pad = next_pow2_at_least(max(t_real, 1))
        padded = np.full((q_pad, t_pad), -1, dtype=np.int32)
        padded[:q_real, :t_real] = queries.astype(np.int32)
        ids = self.session.put(padded)

        best_s = jnp.full((q_pad, k), NEG_INF, dtype=jnp.float32)
        best_i = jnp.full((q_pad, k), -1, dtype=jnp.int32)
        for bi_, b in enumerate(self.buckets):
            rows = b["tok"].shape[0]
            block = min(self.block_rows, rows)
            # rows is a multiple of 8; choose the largest block divisor
            while rows % block:
                block //= 2
            fn = self.session.compile(
                ("ell_query", bi_, block, k, q_pad, t_pad, b["tok"].shape),
                lambda block=block: jax.jit(make_ell_query_step(block, k)),
            )
            best_s, best_i = fn(b["tok"], b["val"], b["doc_ids"], ids, best_s, best_i)

        # final ordering: scores desc (ties by merge order), add token offsets
        valid = padded >= 0
        qoff = np.where(valid, np.asarray(self.offsets)[np.where(valid, padded, 0)], 0.0).sum(1)
        s = np.asarray(best_s)[:q_real] + qoff[:q_real, None]
        i = np.asarray(best_i)[:q_real]
        # replace -inf rows (k > matched docs is impossible since all docs
        # scored; -inf only if k > num_docs which is clamped)
        return i, s.astype(np.float32)

    def get_scores(self, query_ids) -> np.ndarray:
        ids = np.asarray(query_ids, dtype=np.int32).reshape(1, -1)
        docs, scores = self.search(ids, top_k=self.num_docs)
        out = np.zeros(self.num_docs, dtype=np.float32)
        out[docs[0]] = scores[0]
        return out

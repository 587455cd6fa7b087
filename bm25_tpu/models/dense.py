"""Dense device engine: token-major score matrix + jitted gather/sum/top-k.

TPU-native re-design of the reference's flagship accelerator path, the MAX
graph ``gather(score_matrix, query_ids, axis=1) -> sum(axis=-1) ->
transpose -> top_k`` (``/root/reference/gpu_bm25/common.py:40-80``), with the
reference's layout transposed for the hardware: we hold ``st[V+1, D]``
(token-major) so a query's token gathers are contiguous row DMAs instead of
strided column reads, the gather+sum runs as the fused Pallas
gather-accumulate kernel (ops/gather_rows.py; lax.scan fallback off-TPU),
and top-k runs hierarchically per query over the doc axis.

Padding contract: query id -1 (pad/OOV) indexes a dedicated all-zero row, so
masking costs nothing; padded doc columns are forced to -inf before top-k so
they can never be selected.  k, Q and T are bucketed and baked into the jit
cache key (static shapes for XLA).

Suitable for corpora where V*D fits HBM (the reference's only device mode —
it densified the full score matrix too, ``/root/reference/main.py:244``).
For large corpora use models.sparse (padded-postings ELL layout).
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
from bm25_tpu.utils.validate import empty_results, validate_query_batch

NEG_INF = float("-inf")


def make_query_step(num_docs: int, k: int, scoring: str = "gather"):
    """Build the jittable (st, offsets, ids) -> (top_scores, top_docs) step.

    Pure function of static ``num_docs`` (real docs, un-padded) and ``k``;
    shapes of ``ids`` (Q, T) and ``st`` (V_pad, D_pad) are taken from the
    traced arguments.

    ``scoring="matmul"`` is the reference's vectorized SpGEMM alternative
    (sparse one-hot query matrix x score matrix,
    ``/root/reference/bm25_native.py:160-192``), expressed TPU-natively as
    one-hot token counts through two MXU products (bf16 high + residual
    reconstruct ~f32 accuracy; counts are small integers, exact in bf16).
    The default ``"gather"`` (fused gather-accumulate kernel) wins when
    T << V; matmul wins for very wide queries.
    """

    def step(st: jax.Array, offsets: jax.Array, ids: jax.Array,
             st_pair=None, w=None, dmask=None):
        from bm25_tpu.ops.gather_rows import gather_add_rows

        q, t = ids.shape
        d_pad = st.shape[1]
        zero_row = st.shape[0] - 1  # last row is all-zero (pad/OOV target)
        valid = ids >= 0
        safe = jnp.where(valid, ids, zero_row)
        if w is not None:
            w = jnp.where(valid, w.astype(jnp.float32), 0.0)
        if scoring == "matmul":
            hi, lo = st_pair
            from bm25_tpu.utils.counts import (
                split_bf16, sum_split_products, weighted_counts)

            if w is None and ids.shape[1] <= 256:
                # counts are bounded by the query width; integers <= 256
                # are exact in bf16 (wider queries take the scatter-add
                # path below — a count of 257 would silently round)
                counts = jax.nn.one_hot(
                    jnp.where(valid, ids, -1), st.shape[0], dtype=jnp.bfloat16
                ).sum(axis=1)  # one_hot(-1)=0
                scores = sum_split_products(
                    jnp.dot(counts, hi, preferred_element_type=jnp.float32),
                    jnp.dot(counts, lo, preferred_element_type=jnp.float32),
                )
            elif w is None:
                cf = weighted_counts(
                    jnp.where(valid, ids, -1),
                    valid.astype(jnp.float32), st.shape[0],
                )
                c_hi, c_lo = split_bf16(cf)
                scores = sum_split_products(
                    jnp.dot(c_hi, hi, preferred_element_type=jnp.float32),
                    jnp.dot(c_hi, lo, preferred_element_type=jnp.float32),
                    jnp.dot(c_lo, hi, preferred_element_type=jnp.float32),
                )
            else:
                # arbitrary float weights: exact scatter-add counts (the
                # one_hot product compiles to a bf16-pass matmul and
                # corrupts them — utils/counts.py) + bf16 high/residual
                # split so three single-pass MXU products keep ~f32
                cf = weighted_counts(jnp.where(valid, ids, -1), w, st.shape[0])
                c_hi, c_lo = split_bf16(cf)
                scores = sum_split_products(
                    jnp.dot(c_hi, hi, preferred_element_type=jnp.float32),
                    jnp.dot(c_hi, lo, preferred_element_type=jnp.float32),
                    jnp.dot(c_lo, hi, preferred_element_type=jnp.float32),
                )
        elif scoring == "gather":
            # pallas on TPU, scan elsewhere; weights scale gathered rows
            scores = gather_add_rows(st, safe, weights=w)
        else:
            raise ValueError(f"unknown scoring {scoring!r}")

        # doc-independent per-token offsets (bm25l/bm25+ nonoccurrence term)
        if w is not None:
            qoff = jnp.sum(offsets[safe] * w, axis=1)
        else:
            qoff = jnp.sum(
                jnp.where(valid, offsets[safe], jnp.zeros((), offsets.dtype)),
                axis=1,
            )

        doc_ids = lax.broadcasted_iota(jnp.int32, (1, d_pad), 1)
        elig = doc_ids < num_docs
        if dmask is not None:
            # filtered search: (num_docs,) bool, True = eligible
            elig = elig & jnp.pad(dmask, (0, d_pad - num_docs))[None, :]
        masked = jnp.where(elig, scores, NEG_INF)
        from bm25_tpu.ops.topk import select_top_k

        top_scores, top_docs = select_top_k(masked, k)
        top_docs = top_docs.astype(jnp.int32)
        final = top_scores + qoff[:, None]
        if dmask is not None:
            # slots beyond the eligible count: doc -1 / score 0
            ok = top_scores > NEG_INF
            top_docs = jnp.where(ok, top_docs, -1)
            final = jnp.where(ok, final, 0.0)
        return final, top_docs

    return step


@dataclass
class DenseEngine:
    """Device-resident dense BM25 engine (search API mirrors BM25v,
    ``/root/reference/bm25_native.py:76-103``)."""

    st: jax.Array  # (V_pad + 1 zero row, D_pad) float32, token-major
    offsets: jax.Array  # (V_pad + 1,) float32
    num_docs: int
    vocab_size: int
    session: Session
    vocab: dict[str, int] | None = None
    scoring: str = "gather"  # or "matmul" (full-vocab SpGEMM variant)
    # lazily-built bf16 (high, residual) split of st for scoring="matmul";
    # computed once instead of two full passes over st per batch
    _st_pair: tuple | None = None

    # -- construction --------------------------------------------------------

    @classmethod
    def from_scored_index(
        cls,
        index: ScoredIndex,
        session: Session | None = None,
        max_bytes: int = 12 << 30,
        dtype=jnp.float32,
    ) -> "DenseEngine":
        session = session or get_session()
        v, d = index.vocab_size, index.num_docs
        # the Pallas gather kernel's REAL doc-column quantum (1024 up to
        # 262144 docs, block-balanced beyond): any other padding makes the
        # kernel re-pad the WHOLE (V, D) table inside every jitted query
        # step — an O(V*D) HBM copy on the hot path
        from bm25_tpu.ops.gather_rows import doc_pad

        d_pad = doc_pad(d)
        v_pad = next_multiple(v + 1, 8)  # +1 zero row for pad/OOV ids
        need = v_pad * d_pad * np.dtype(dtype).itemsize
        if need > max_bytes:
            raise MemoryError(
                f"dense engine needs {need / 2**30:.1f} GiB "
                f"({v_pad} x {d_pad} {np.dtype(dtype).name}) > budget "
                f"{max_bytes / 2**30:.1f} GiB; use models.sparse.SparseEngine"
            )
        st_host = np.zeros((v_pad, d_pad), dtype=np.float32)
        # fill token rows straight from the CSC arrays — toarray().T would
        # materialize a SECOND full (D, V) dense copy next to st_host,
        # doubling peak host RAM past what the budget check accounts for
        csc = index.to_csc()
        col_of = np.repeat(
            np.arange(v, dtype=np.int64), np.diff(csc.indptr)
        )
        st_host[col_of, csc.indices] = csc.data
        off_host = np.zeros((v_pad,), dtype=np.float32)
        if index.token_offsets is not None:
            off_host[:v] = index.token_offsets
        return cls(
            st=session.put(st_host.astype(dtype)),
            offsets=session.put(off_host),
            num_docs=d,
            vocab_size=v,
            session=session,
            vocab=index.vocab,
        )

    # -- query path -----------------------------------------------------------

    def _prepare(self, queries: np.ndarray) -> np.ndarray:
        queries, _ = validate_query_batch(queries, self.vocab_size)
        return queries.astype(np.int32)

    def search(
        self, queries: np.ndarray, top_k: int = 100,
        weights: np.ndarray | None = None,
        doc_mask: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched top-k: (Q, T) int32 (-1 = pad) -> (docs (Q,k), scores (Q,k)).

        ``weights`` (same shape, float) scales each token's contribution
        (pad entries ignored).  ``doc_mask`` ((num_docs,) bool, True =
        eligible) restricts results to a doc subset; slots beyond the
        eligible count come back as doc -1 / score 0.
        """
        queries = self._prepare(queries)
        _, weights = validate_query_batch(queries, self.vocab_size, weights)
        k = min(top_k, self.num_docs)
        if len(queries) == 0 or k <= 0:
            return empty_results(len(queries), k)
        dmask = None
        if doc_mask is not None:
            from bm25_tpu.models.sparse import prepare_doc_mask

            dmask = prepare_doc_mask(doc_mask, self.num_docs, self.session)
        top_scores, top_docs = self._dispatch(queries, top_k, weights,
                                              dmask=dmask)
        q_real = len(queries)
        return np.asarray(top_docs)[:q_real], np.asarray(top_scores)[:q_real]

    def search_pipelined(
        self, queries: np.ndarray, top_k: int = 100, batch: int = 512
    ) -> tuple[np.ndarray, np.ndarray]:
        """Large-batch search with async dispatch: all sub-batches are
        enqueued before any result is fetched, so device compute overlaps
        host<->device transfers (JAX async dispatch)."""
        queries = self._prepare(queries)
        k = min(top_k, self.num_docs)
        if len(queries) == 0 or k <= 0:
            return empty_results(len(queries), k)
        futures = []
        for i in range(0, len(queries), batch):
            chunk = queries[i : i + batch]
            futures.append((len(chunk), self._dispatch(chunk, top_k)))
        # one batched fetch: the relay moves multiple arrays concurrently
        fetched = jax.device_get([r for _, r in futures])
        docs = np.concatenate(
            [d[:n] for (n, _), (s, d) in zip(futures, fetched)]
        )
        scores = np.concatenate(
            [s[:n] for (n, _), (s, d) in zip(futures, fetched)]
        )
        return docs, scores

    def _dispatch(self, queries: np.ndarray, top_k: int,
                  weights: np.ndarray | None = None, dmask=None):
        """Enqueue one padded sub-batch; returns unfetched device arrays."""
        k = min(top_k, self.num_docs)
        q_real, t_real = queries.shape
        q_pad = next_multiple(q_real, 8)
        t_pad = next_pow2_at_least(max(t_real, 8))
        padded = np.full((q_pad, t_pad), -1, dtype=np.int32)
        padded[:q_real, :t_real] = queries
        weighted = weights is not None
        step = self.session.compile(
            ("dense_query", self.num_docs, k, q_pad, t_pad, self.st.shape,
             self.scoring, weighted, dmask is not None),
            lambda: jax.jit(make_query_step(self.num_docs, k, self.scoring)),
        )
        st_pair = None
        if self.scoring == "matmul":
            if self._st_pair is None:
                hi = jax.jit(lambda s: s.astype(jnp.bfloat16))(self.st)
                lo = jax.jit(
                    lambda s, h: (s - h.astype(s.dtype)).astype(jnp.bfloat16)
                )(self.st, hi)
                self._st_pair = (hi, lo)
            st_pair = self._st_pair
        wpadded = None
        if weighted:
            wp = np.zeros((q_pad, t_pad), dtype=np.float32)
            wp[:q_real, :t_real] = weights
            wpadded = self.session.put(wp)
        return step(self.st, self.offsets, self.session.put(padded), st_pair,
                    wpadded, dmask)

    def get_scores(self, query_ids) -> np.ndarray:
        """Dense (D,) scores for a single query (reference bm25.py:124)."""
        ids = np.asarray(query_ids, dtype=np.int32).reshape(1, -1)
        docs, scores = self.search(ids, top_k=self.num_docs)
        out = np.zeros(self.num_docs, dtype=np.float32)
        out[docs[0]] = scores[0]
        return out

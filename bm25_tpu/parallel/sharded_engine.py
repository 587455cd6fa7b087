"""Doc-sharded BM25 engine: shard_map scoring + all-gather top-k merge.

Algorithmic shape mirrors the reference's two-stage GPU top-k
(``/root/reference/operations/topk.mojo:576-661`` stage 1 per-block local
top-k, ``:670-830`` stage 2 merge) lifted to the device mesh: every chip
scores only its doc shard and selects local top-k candidates; the
``(shards * k)`` candidate set rides ICI via ``lax.all_gather`` and the final
merge runs replicated.  Tie-breaking stays deterministic (smaller global doc
id wins) because shard 0's candidates precede shard 1's in the gathered
order and ``lax.top_k`` is stable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bm25_tpu.parallel.mesh import DATA_AXIS, DOC_AXIS, make_mesh
from bm25_tpu.scoring import ScoredIndex
from bm25_tpu.utils.padding import next_multiple, next_pow2_at_least
from bm25_tpu.utils.validate import empty_results, validate_query_batch

NEG_INF = float("-inf")


def make_sharded_query_step(mesh: Mesh, num_docs: int, k: int,
                            weighted: bool = False, masked: bool = False):
    """Build the pjit-able sharded (st, offsets, ids) -> (scores, docs) step.

    st: (V_pad, D_pad) sharded P(None, 'docs');  ids: (Q, T) sharded
    P('data', None); outputs sharded P('data', None).  ``weighted=True``
    appends a (Q, T) f32 per-token weight operand (sharded like ids).
    """
    n_doc_shards = mesh.shape[DOC_AXIS]

    def local_step(st_l, offsets, ids, *rest):
        from bm25_tpu.ops.gather_rows import gather_add_rows

        rest = list(rest)
        w = rest.pop(0) if weighted else None
        # filtered search: (D_pad,) bool sharded over docs like st columns
        mask_l = rest.pop(0) if masked else None
        # st_l: (V_pad, D_pad / n_doc_shards) — this shard's doc slice
        q, t = ids.shape
        d_local = st_l.shape[1]
        zero_row = st_l.shape[0] - 1
        valid = ids >= 0
        safe = jnp.where(valid, ids, zero_row)
        if w is not None:
            w = jnp.where(valid, w.astype(jnp.float32), 0.0)

        # same fused scalar-prefetch gather kernel as the single-chip
        # DenseEngine (3.1x the scan-gather; docs/design.md) — kernel parity
        # between sharded and single-chip dense paths
        scores = gather_add_rows(st_l, safe, weights=w)

        if w is not None:
            qoff = jnp.sum(offsets[safe] * w, axis=1)
        else:
            qoff = jnp.sum(
                jnp.where(valid, offsets[safe], jnp.zeros((), offsets.dtype)),
                axis=1,
            )

        shard = lax.axis_index(DOC_AXIS)
        doc_base = shard * d_local
        local_ids = lax.broadcasted_iota(jnp.int32, (1, d_local), 1)
        elig = doc_base + local_ids < num_docs
        if mask_l is not None:
            elig = elig & mask_l[None, :]
        scores_m = jnp.where(elig, scores, NEG_INF)

        from bm25_tpu.ops.topk import select_top_k

        k_local = min(k, d_local)
        top_s, top_i = select_top_k(scores_m, k_local)  # stage 1: local
        top_i = top_i.astype(jnp.int32) + doc_base

        # stage 2: all-gather (shards, q, k_local) candidates over ICI, merge
        cand_s = lax.all_gather(top_s, DOC_AXIS)  # (S, q, k_local)
        cand_i = lax.all_gather(top_i, DOC_AXIS)
        cand_s = jnp.transpose(cand_s, (1, 0, 2)).reshape(q, -1)
        cand_i = jnp.transpose(cand_i, (1, 0, 2)).reshape(q, -1)

        kk = min(k, cand_s.shape[1])
        merged_s, merged_pos = lax.top_k(cand_s, kk)
        merged_i = jnp.take_along_axis(cand_i, merged_pos, axis=1)
        final_s = merged_s + qoff[:, None]
        if mask_l is not None:
            # slots beyond the eligible count: doc -1 / score 0
            ok = merged_s > NEG_INF
            merged_i = jnp.where(ok, merged_i, -1)
            final_s = jnp.where(ok, final_s, 0.0)
        return final_s, merged_i

    in_specs = (P(None, DOC_AXIS), P(), P(DATA_AXIS, None))
    if weighted:
        in_specs += (P(DATA_AXIS, None),)
    if masked:
        in_specs += (P(DOC_AXIS),)
    return jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False,
    )


def _put_doc_sharded_dense(index: ScoredIndex, mesh: Mesh, v_pad: int,
                           d_pad: int, dtype) -> jax.Array:
    """Upload the (V_pad, D_pad) score matrix doc-shard by doc-shard.

    The host never materializes more than one shard's (V_pad, D_pad/S)
    column block — ``toarray()`` of the full matrix is a
    num_docs*vocab*4-byte host buffer, impossible at the corpus sizes the
    sharded engine exists for (VERDICT r2 missing item 4).  Column blocks
    slice cheaply from the CSC form; devices replicated along the data
    axis share one host block (built once, put per device).
    """
    sharding = NamedSharding(mesh, P(None, DOC_AXIS))
    shape = (v_pad, d_pad)
    # to_csc() is (num_docs, vocab); doc blocks are ROW slices — go through
    # CSR once so each block slices in O(block nnz)
    csr = index.to_csc().tocsr()
    v, d = index.vocab_size, index.num_docs
    dev_map = sharding.addressable_devices_indices_map(shape)
    # group devices by column block so data-axis replicas share one host
    # build, then free each block after its last device_put — peak host
    # memory is ONE (v_pad, d_pad/S) block, never the full matrix
    groups: dict[tuple[int, int], list] = {}
    for dev, idx in dev_map.items():
        col = idx[1]
        start = 0 if col.start is None else col.start
        stop = d_pad if col.stop is None else col.stop
        groups.setdefault((start, stop), []).append(dev)
    by_dev: dict = {}
    for (start, stop), devs in groups.items():
        block = np.zeros((v_pad, stop - start), dtype=np.float32)
        lo, hi = min(start, d), min(stop, d)
        if hi > lo:
            block[:v, : hi - lo] = csr[lo:hi].toarray().T
        if np.dtype(dtype) != np.dtype(np.float32):
            # ml_dtypes registers bfloat16 with numpy, so the cast
            # happens host-side and the upload ships target bytes
            block = block.astype(dtype)
        for dev in devs:
            by_dev[dev] = jax.device_put(block, dev)
        # block until the transfers land so dropping the host buffer is
        # safe AND the next block's build overlaps nothing it shouldn't
        for dev in devs:
            by_dev[dev].block_until_ready()
        del block
    arrays = [by_dev[dev] for dev in dev_map]
    return jax.make_array_from_single_device_arrays(shape, sharding, arrays)


@dataclass
class ShardedEngine:
    """Multi-chip dense BM25 engine over a (data, docs) mesh."""

    st: jax.Array  # (V_pad+1, D_pad) sharded over docs
    offsets: jax.Array  # (V_pad+1,) replicated
    num_docs: int
    vocab_size: int
    mesh: Mesh
    vocab: dict[str, int] | None = None
    _cache: dict = field(default_factory=dict)
    # transient (Q, d_local) score tiles per chip are bounded by chunking
    # queries — the same worker-killing OOM class the single-chip engine
    # budgets against (models/sparse.py::fit_score_buffer_budget)
    score_buffer_budget: int = 4 << 30
    chunk_queries: int = 2048

    @classmethod
    def from_scored_index(
        cls,
        index: ScoredIndex,
        mesh: Mesh | None = None,
        dtype=jnp.float32,
    ) -> "ShardedEngine":
        mesh = mesh or make_mesh()
        n_doc = mesh.shape[DOC_AXIS]
        v, d = index.vocab_size, index.num_docs
        # each shard's local width must be the Pallas gather kernel's REAL
        # doc-column quantum (ops/gather_rows.py::doc_pad) — anything else
        # makes the kernel re-pad the shard's full table inside every
        # jitted local step
        from bm25_tpu.ops.gather_rows import doc_pad

        d_pad = doc_pad(-(-max(d, 1) // n_doc)) * n_doc
        v_pad = next_multiple(v + 1, 8)
        # host blocks are cast to the target dtype BEFORE upload: a
        # device-side cast would transiently hold f32 + target copies
        # (~3x the steady state) and defeat picking bf16 for memory
        st = _put_doc_sharded_dense(index, mesh, v_pad, d_pad, dtype)
        off_host = np.zeros((v_pad,), dtype=np.float32)
        if index.token_offsets is not None:
            off_host[:v] = index.token_offsets
        offsets = jax.device_put(off_host, NamedSharding(mesh, P()))
        return cls(
            st=st,
            offsets=offsets,
            num_docs=d,
            vocab_size=v,
            mesh=mesh,
            vocab=index.vocab,
            _cache={},
        )

    def _max_chunk(self) -> int:
        """Queries per dispatch bounded by the per-chip transient budget.

        Queries shard over the data axis, so each chip's transient score
        tile is (q/n_data, d_local) — the budget buys n_data times more
        GLOBAL query rows than a single-chip tile would."""
        n_doc = self.mesh.shape[DOC_AXIS]
        n_data = self.mesh.shape[DATA_AXIS]
        d_local = self.st.shape[1] // n_doc
        align = 8 * n_data
        max_q = max(
            align,
            (self.score_buffer_budget // (4 * d_local) * n_data)
            // align * align,
        )
        return min(max_q, self.chunk_queries)

    def search(
        self, queries: np.ndarray, top_k: int = 100,
        weights: np.ndarray | None = None,
        doc_mask: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        queries, weights = validate_query_batch(
            queries, self.vocab_size, weights
        )
        dmask = None
        if doc_mask is not None:
            m = np.asarray(doc_mask)
            if m.shape != (self.num_docs,):
                raise ValueError(
                    f"doc_mask shape {m.shape} != ({self.num_docs},)"
                )
        k = min(top_k, self.num_docs)
        if len(queries) == 0 or k <= 0:
            return empty_results(len(queries), k)
        if doc_mask is not None:
            d_pad = self.st.shape[1]
            mp = np.zeros(d_pad, dtype=bool)
            mp[: self.num_docs] = m.astype(bool)
            dmask = jax.device_put(
                mp, NamedSharding(self.mesh, P(DOC_AXIS))
            )
        n_data = self.mesh.shape[DATA_AXIS]
        q_real, t_real = queries.shape
        t_pad = next_pow2_at_least(max(t_real, 8))
        weighted = weights is not None
        masked = dmask is not None
        qsh = NamedSharding(self.mesh, P(DATA_AXIS, None))
        max_q = self._max_chunk()
        futures = []
        for i in range(0, q_real, max_q):
            chunk = queries[i : i + max_q]
            cq = len(chunk)
            q_pad = next_multiple(cq, 8 * n_data)
            padded = np.full((q_pad, t_pad), -1, dtype=np.int32)
            padded[:cq, :t_real] = chunk.astype(np.int32)
            key = (self.num_docs, k, q_pad, t_pad, self.st.shape, weighted,
                   masked)
            fn = self._cache.get(key)
            if fn is None:
                fn = jax.jit(make_sharded_query_step(
                    self.mesh, self.num_docs, k, weighted=weighted,
                    masked=masked
                ))
                self._cache[key] = fn
            args = [self.st, self.offsets, jax.device_put(padded, qsh)]
            if weighted:
                wp = np.zeros((q_pad, t_pad), dtype=np.float32)
                wp[:cq, :t_real] = weights[i : i + max_q]
                args.append(jax.device_put(wp, qsh))
            if masked:
                args.append(dmask)
            scores, docs = fn(*args)
            futures.append((cq, docs, scores))
        # one batched fetch of every chunk's results (1.5x the serial rate
        # through the relay; see models/sparse.py)
        flat = jax.device_get([x for _, d_, s_ in futures for x in (d_, s_)])
        out_docs, out_scores = [], []
        for (cq, _, _), di, si in zip(
            futures, flat[0::2], flat[1::2]
        ):
            out_docs.append(np.asarray(di)[:cq])
            out_scores.append(np.asarray(si)[:cq])
        return np.concatenate(out_docs), np.concatenate(out_scores)


def _bucket_specs(buckets: list[dict]) -> tuple:
    """PartitionSpec pytree matching a bucket list (arrays shard over docs)."""
    spec_of = {
        "tokT": P(None, DOC_AXIS),
        "valT": P(None, DOC_AXIS),
        "hotT": P(None, DOC_AXIS),
        "hotLo": P(None, DOC_AXIS),
        "doc_ids": P(DOC_AXIS),
    }
    return tuple({key: spec_of[key] for key in b} for b in buckets)


def choose_k_local(k: int, n_shards: int) -> int:
    """Shard-local candidate count for the two-stage merge.

    Cost model (v5e numbers): the all-gather moves ``S*k*Q*8`` bytes over
    ICI (~0.5 ms at S=8, k=1000, Q=512) and the replicated merge two-key
    sorts ``(Q, S*k)`` (~2-3 ms at 8k wide, growing ~linearly) — under
    ~5% of the ~80 ms local step at S=8, so trimming is pure risk there.
    At S >= 32 the merge sort alone (32k+ wide) crosses ~10 ms and the
    trim pays: each shard returns ``ceil(2k/S) + 64`` candidates (2x the
    expected per-shard share of a uniformly split top-k, plus slack), and
    the step verifies exactness after the merge (strict inequality
    against the merged k-th score) with a full-k fallback via lax.cond.
    """
    if n_shards < 32:
        return k
    return min(k, -(-2 * k // n_shards) + 64)


def make_sharded_ell_step(mesh: Mesh, k: int, hot_h: int,
                          buckets: list[dict], weighted: bool = False,
                          split_cold: bool = False, score_dtype=None,
                          ids_only: bool = False,
                          k_local: int | None = None,
                          masked: bool = False,
                          local_only: bool = False):
    """Doc-sharded multi-bucket ELL scoring + all-gather top-k merge.

    Per bucket: tokT/valT/hotT/hotLo (rows axis) shard P(None, 'docs') and
    doc_ids P('docs'); ids: (Q, T) sharded P('data', None).  Each chip runs
    the same fused Pallas kernel as the single-chip SparseEngine (ELL scan +
    split-precision hot matmul + pad mask + first-level group maxima) on its
    row slice of every bucket, selects local candidates hierarchically,
    merges its buckets with a two-key (score desc, doc asc) sort, and the
    (shards * k) candidate set merges over ICI with the same two-key sort —
    so the smaller-doc-id tie contract holds across both buckets and shards.
    Algorithmic shape: the reference's two-stage GPU top-k
    (``/root/reference/operations/topk.mojo:576-830``) lifted to the mesh.
    """

    def local_step(hot_table, ids, *rest):
        from bm25_tpu.models.sparse import bucket_base_scores
        from bm25_tpu.ops.topk import select_top_k, top_k_tree_with_maxes

        rest = list(rest)
        cold = rest.pop(0) if split_cold else None
        if weighted:
            w = rest.pop(0)
            w_cold = rest.pop(0) if split_cold else None
        else:
            w = w_cold = None
        # filtered search: replicated (num_docs,) bool gathered by each
        # shard's global doc ids (bucket row order is not a contiguous
        # global id range, so the mask cannot shard over the doc axis)
        mask = rest.pop(0) if masked else None
        bucket_arrays = rest
        q = ids.shape[0]
        valid = ids >= 0
        if w is not None:
            w = jnp.where(valid, w.astype(jnp.float32), 0.0)
        hot_counts = hot_counts_lo = None
        if hot_h > 0:
            safe = jnp.where(valid, ids, 0)
            hot_ids = jnp.where(valid, hot_table[safe], -1)
            if w is None and ids.shape[1] <= 256:
                # counts <= the query width are exact in bf16; wider
                # queries take the exact scatter-add path (see
                # models/sparse.py — a count of 257 would silently round)
                hot_counts = jax.nn.one_hot(hot_ids, hot_h, dtype=jnp.bfloat16)
                hot_counts = hot_counts.sum(axis=1)
            elif w is None:
                from bm25_tpu.utils.counts import split_bf16, weighted_counts

                hot_counts, hot_counts_lo = split_bf16(
                    weighted_counts(hot_ids, valid.astype(jnp.float32), hot_h)
                )
            else:
                # float weights: exact scatter-add counts + bf16 high/
                # residual split (same as models/sparse.py; the one_hot
                # product would compile to a bf16-pass matmul)
                from bm25_tpu.utils.counts import split_bf16, weighted_counts

                cf = weighted_counts(hot_ids, w, hot_h)
                hot_counts, hot_counts_lo = split_bf16(cf)
        if split_cold:
            # cold-width routing (see models/sparse.py): the scan reads
            # only the narrow cold ids; hot counts above used the full ids
            ids, w = cold, w_cold
            valid = ids >= 0
            if w is not None:
                w = jnp.where(valid, w.astype(jnp.float32), 0.0)
        interpret = jax.devices()[0].platform != "tpu"

        cand_s, cand_i = [], []
        for b in bucket_arrays:
            if cand_s:
                # chain buckets so XLA schedules them sequentially (one
                # (Q, rows) base live at a time; see models/sparse.py)
                ids_in, _ = lax.optimization_barrier((ids, cand_s[-1]))
            else:
                ids_in = ids
            did_l = b["doc_ids"]
            # shared per-bucket base (models/sparse.py::bucket_base_scores):
            # fused kernel or hot-only epilogue, with any doc mask folded
            # into the kernel's pad-row mask — the SAME code path as the
            # single-chip step, so filtered-search semantics cannot drift.
            # Candidate ids still come from the real did_l below.
            scores, gmax = bucket_base_scores(
                b, ids_in, q, hot_counts=hot_counts,
                hot_counts_lo=hot_counts_lo, w=w, mask=mask,
                interpret=interpret,
            )
            # NB: named kk_b, NOT k_local — that name is the enclosing
            # step factory's trim parameter and assigning it here would
            # shadow it for the whole function (a real bug caught in the
            # round-3 review: the ICI trim was silently dead code)
            kk_b = min(k, scores.shape[1])
            if (gmax is not None and scores.shape[1] > max(2 * kk_b, 4096)
                    and gmax.shape[1] >= kk_b):
                from bm25_tpu.ops.ell_score import GROUP as _group

                ls, lpos = top_k_tree_with_maxes(scores, gmax, kk_b,
                                                 branch=_group)
            else:
                ls, lpos = select_top_k(scores, kk_b)
            cand_s.append(ls)
            cand_i.append(did_l[lpos])

        # local merge across buckets: two-key (score desc, doc asc) sort —
        # bucket rows interleave doc ids, so positional stability is not
        # enough for the tie contract here
        ls = jnp.concatenate(cand_s, axis=1)
        li = jnp.concatenate(cand_i, axis=1)
        kk = min(k, ls.shape[1])
        nss, dd = lax.sort((-ls, li), num_keys=2, is_stable=False)
        ls, li = -nss[:, :kk], dd[:, :kk]
        if local_only:
            # instrumentation cut (NOT a user contract): stop after the
            # per-shard local top-k so the ICI all-gather + replicated
            # merge cost is measurable as t(full) - t(local_only)
            # (scripts/exp_r4_sharded_midscale.py's merge-share row)
            return ls, li

        def gather_merge(ls_t, li_t):
            """All-gather candidates over ICI + replicated two-key merge."""
            gs = lax.all_gather(ls_t, DOC_AXIS)  # (S, q, width)
            gi = lax.all_gather(li_t, DOC_AXIS)
            gsf = jnp.transpose(gs, (1, 0, 2)).reshape(q, -1)
            gif = jnp.transpose(gi, (1, 0, 2)).reshape(q, -1)
            kf = min(k, gsf.shape[1])
            nss_, dd_ = lax.sort((-gsf, gif), num_keys=2, is_stable=False)
            return -nss_[:, :kf], dd_[:, :kf], gs

        n_shards = mesh.shape[DOC_AXIS]
        m = k if k_local is None else min(k_local, kk)
        if m < kk and n_shards * m >= k:
            # k_local trim: gather only each shard's top-m candidates
            # (m ~ 2k/S + slack) — cuts both ICI volume and the merge sort
            # width from S*k to S*m.  Exactness check after the merge: if
            # any shard's m-th (last trimmed) candidate still scores >=
            # the merged k-th, that shard may hold more top-k docs (or tie
            # at the boundary with smaller doc ids) — fall back to the
            # full-width gather of the ALREADY-computed local candidates
            # (no re-scoring).  The distributed analog of the union
            # selection's tie flag (ops/topk.py::union_group_select).
            t_s, t_i, gs3 = gather_merge(ls[:, :m], li[:, :m])
            merged_kth = t_s[:, -1]
            last = gs3[:, :, m - 1]  # (S, q) each shard's m-th score
            ok = jnp.all((last < merged_kth[None, :]) | (last == NEG_INF))

            def full():
                f_s, f_i, _ = gather_merge(ls, li)
                return f_s[:, : t_s.shape[1]], f_i[:, : t_i.shape[1]]

            out_s, out_i = lax.cond(ok, lambda: (t_s, t_i), full)
        else:
            out_s, out_i, _ = gather_merge(ls, li)
        if masked:
            # slots beyond the eligible count: doc -1 / score 0 (same
            # contract as the single-chip engines' filtered search)
            elig_out = out_s > NEG_INF
            out_i = jnp.where(elig_out, out_i, -1)
            out_s = jnp.where(elig_out, out_s, 0.0)
        if ids_only:
            # rankings-only: selection already ran in f32; skip the score
            # transfer entirely (same contract as SparseEngine.search_ids)
            return out_i
        if score_dtype is not None:
            # halve the result-transfer bytes; ids stay exact int32
            out_s = out_s.astype(score_dtype)
        return out_s, out_i

    in_specs = (P(), P(DATA_AXIS, None))
    if split_cold:
        in_specs += (P(DATA_AXIS, None),)
    if weighted:
        in_specs += (P(DATA_AXIS, None),)
        if split_cold:
            in_specs += (P(DATA_AXIS, None),)
    if masked:
        in_specs += (P(),)  # replicated eligibility mask
    if local_only:
        # each (data, doc) shard holds its own (q_local, kk) candidates
        out_specs = (P((DATA_AXIS, DOC_AXIS), None),
                     P((DATA_AXIS, DOC_AXIS), None))
    elif ids_only:
        out_specs = P(DATA_AXIS, None)
    else:
        out_specs = (P(DATA_AXIS, None), P(DATA_AXIS, None))
    return jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=in_specs + _bucket_specs(buckets),
        out_specs=out_specs,
        check_vma=False,
    )


@dataclass
class ShardedSparseEngine:
    """Multi-chip doc-sharded multi-bucket ELL BM25 engine.

    Same three pieces as the single-chip SparseEngine — length-bucketed ELL
    postings scored by the fused Pallas kernel plus a dense hot-token
    sub-matrix — with every bucket's row axis sharded over the mesh's doc
    axis and the two-stage top-k merge riding ICI.
    """

    buckets: list  # dicts: doc_ids, [tokT, valT, hotT, hotLo]; rows sharded
    hot_table: jax.Array  # (V+1,) replicated; token id -> hot rank or -1
    hot_h: int
    offsets: jax.Array  # (V+1,) replicated
    num_docs: int
    vocab_size: int
    mesh: Mesh
    vocab: dict[str, int] | None = None
    _cache: dict = field(default_factory=dict)
    # transient (Q, rows_local) score tiles per chip are bounded by chunking
    # queries, mirroring the single-chip engine's budget (device OOMs kill
    # the TPU worker rather than raising)
    score_buffer_budget: int = 4 << 30
    chunk_queries: int = 512
    # long-query dedup: same policy as the single-chip SparseEngine
    dedup_queries: bool | str = "auto"
    dedup_min_width: int = 16
    # cold-width query routing (see models/sparse.py): same policy and
    # gating as the single-chip engine
    route_cold: bool | str = "auto"
    route_min_queries: int = 32
    hot_table_host: np.ndarray | None = None
    # "bfloat16" halves the result-transfer bytes (ids stay exact int32;
    # selection stays f32 on device) — same option as SparseEngine
    score_dtype: str = "float32"
    # shard-local candidate trim for the ICI merge: "auto" applies
    # choose_k_local's cost model (full k below 32 shards, ~2k/S + slack
    # above, exactness-checked with a full-width fallback); an int forces
    # a specific m; None disables
    k_local: int | str | None = "auto"
    # lazy host copy of the replicated (immutable) token offsets: fetched
    # once, reused by every chunk of every search (the qoff host add)
    _offsets_host: np.ndarray | None = field(default=None, repr=False)

    @classmethod
    def from_scored_index(
        cls, index: ScoredIndex, mesh: Mesh | None = None, dtype=jnp.float32,
        hot_tokens: int | str = "auto", hot_budget_bytes: int | None = None,
        max_buckets: int = 4, score_dtype: str = "float32",
        overhead_target: float | None = None,
    ) -> "ShardedSparseEngine":
        from bm25_tpu.models.sparse import (
            PAD_TOK, build_ell_buckets_from_csr, choose_hot_tokens)
        from bm25_tpu.ops.ell_score import BLOCK_ROWS
        from bm25_tpu.utils.padding import next_multiple as _nm

        mesh = mesh or make_mesh()
        n_doc = mesh.shape[DOC_AXIS]
        if overhead_target is not None and hot_tokens != "auto":
            raise ValueError(
                "overhead_target steers the auto hot-tier policy; it "
                "cannot combine with an explicit hot_tokens count"
            )
        if hot_tokens == "auto":
            # same cost model as the single-chip engine; each shard scores
            # rows/n_doc of every bucket so the per-chip trade is unchanged
            h = choose_hot_tokens(
                index, max_buckets=max_buckets,
                budget_bytes=hot_budget_bytes,
                row_align=BLOCK_ROWS * n_doc,
                device=mesh.devices.flat[0],
                overhead_target=overhead_target,
            )
        else:
            budget = hot_budget_bytes
            if budget is None:
                budget = (index.data.nbytes + index.indices.nbytes
                          + index.indptr.nbytes)
            max_h = budget // max(index.num_docs * 4, 1)
            h = int(min(hot_tokens, max_h, index.vocab_size))
        if h > 0:
            from bm25_tpu.models.sparse import split_hot_cold_csr

            hot_ids, source_csr, hot_csr = split_hot_cold_csr(index, h)
            h = len(hot_ids)
        else:
            hot_ids, hot_csr = np.zeros(0, np.int32), None
            source_csr = index.to_csc().tocsr()
        # every bucket's rows align to (kernel tile x doc shards) so each
        # shard's slice stays kernel-tile aligned
        host_buckets = build_ell_buckets_from_csr(
            source_csr, index.num_docs, max_buckets=max_buckets,
            row_align=BLOCK_ROWS * n_doc,
        )
        v = index.vocab_size
        hot_table = np.full((v + 1,), -1, dtype=np.int32)
        if h > 0:
            hot_table[hot_ids] = np.arange(h, dtype=np.int32)

        row_sh = NamedSharding(mesh, P(None, DOC_AXIS))
        dev_buckets = []
        for b in host_buckets:
            entry = {
                "doc_ids": jax.device_put(
                    b.doc_ids, NamedSharding(mesh, P(DOC_AXIS))
                )
            }
            if b.tok is not None and b.tok.size:
                l_pad = _nm(b.tok.shape[1], 8)
                tok_t = np.full((l_pad, b.tok.shape[0]), PAD_TOK,
                                dtype=np.int32)
                tok_t[: b.tok.shape[1]] = b.tok.T
                val_t = np.zeros((l_pad, b.val.shape[0]), dtype=np.float32)
                val_t[: b.val.shape[1]] = b.val.T
                entry["tokT"] = jax.device_put(tok_t, row_sh)
                entry["valT"] = jax.device_put(val_t.astype(dtype), row_sh)
            if h > 0:
                # dense hot pair built ON DEVICE per shard from the sparse
                # hot postings (upload ~nnz_hot*8 bytes, not H*rows*4 —
                # same cold-start fix as the single-chip engine); the scan
                # is row-parallel so shard_map runs it shard-local with no
                # collectives
                from bm25_tpu.models.sparse import (
                    build_hot_pair_device, hot_ell_for_rows)

                htok, hval = hot_ell_for_rows(hot_csr, b.doc_ids)
                build = jax.jit(jax.shard_map(
                    build_hot_pair_device,
                    mesh=mesh,
                    in_specs=(P(), P(None, DOC_AXIS), P(None, DOC_AXIS)),
                    out_specs=(P(None, DOC_AXIS), P(None, DOC_AXIS)),
                    check_vma=False,
                ))
                hot_hi, hot_lo = build(
                    jax.device_put(hot_ids.reshape(-1, 1),
                                   NamedSharding(mesh, P())),
                    jax.device_put(htok, row_sh),
                    jax.device_put(hval, row_sh),
                )
                hot_hi.block_until_ready()  # free the ELL upload eagerly
                entry["hotT"] = hot_hi
                entry["hotLo"] = hot_lo
            dev_buckets.append(entry)

        off_host = np.zeros((v + 1,), dtype=np.float32)
        if index.token_offsets is not None:
            off_host[:v] = index.token_offsets
        offsets = jax.device_put(off_host, NamedSharding(mesh, P()))
        from bm25_tpu.models.sparse import _score_sdt

        _score_sdt(score_dtype)  # validate at build time
        return cls(
            buckets=dev_buckets,
            hot_table=jax.device_put(hot_table, NamedSharding(mesh, P())),
            hot_table_host=hot_table,
            hot_h=h, offsets=offsets,
            num_docs=index.num_docs, vocab_size=v, mesh=mesh,
            vocab=index.vocab, _cache={}, score_dtype=score_dtype,
        )

    def _max_chunk(self) -> int:
        # bound transient (Q, rows_local) tiles per chip like the
        # single-chip engine; rows shard over the doc axis.  The per-chip
        # query slice must land on a legal kernel tiling (<= BLOCK_Q or a
        # multiple of it), so chunks above one tile round down to a
        # tile-multiple per data shard.
        from bm25_tpu.ops.ell_score import BLOCK_Q

        n_doc = self.mesh.shape[DOC_AXIS]
        n_data = self.mesh.shape[DATA_AXIS]
        max_rows = max(
            b["doc_ids"].shape[0] // n_doc for b in self.buckets
        )
        # queries shard over the data axis: each chip's tile holds only
        # q/n_data rows, so the per-chip budget buys n_data x more global
        # query rows than the single-chip formula would grant
        max_q = max(
            8,
            (self.score_buffer_budget // (4 * max_rows) * n_data) // 8 * 8,
        )
        if max_q > BLOCK_Q * n_data:
            max_q = max_q // (BLOCK_Q * n_data) * (BLOCK_Q * n_data)
        return min(max_q, self.chunk_queries)

    def search(
        self, queries: np.ndarray, top_k: int = 100,
        weights: np.ndarray | None = None,
        doc_mask: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        return self._dispatch(queries, top_k, weights, ids_only=False,
                              doc_mask=doc_mask)

    def search_ids(
        self, queries: np.ndarray, top_k: int = 100,
        weights: np.ndarray | None = None,
        doc_mask: np.ndarray | None = None,
    ) -> np.ndarray:
        """Rankings only: skip the device->host score transfer entirely.

        Selection (and the cross-shard merge) still runs in exact f32 on
        device — only the returned payload shrinks.  Same contract as
        ``SparseEngine.search_ids``.
        """
        return self._dispatch(queries, top_k, weights, ids_only=True,
                              doc_mask=doc_mask)

    def _plan(self, queries, weights, k: int):
        """Dedup + chunk planning with the canonical dispatch arguments.

        Single source of truth shared by ``_dispatch`` and
        ``bench_step_fn`` — planning from two hand-kept copies is how a
        bench chunk could silently diverge from the production chunk of
        the same batch (ADVICE r3).
        """
        from bm25_tpu.models.sparse import (
            chunk_c0_units, maybe_dedup, plan_query_dispatch)

        queries, weights = maybe_dedup(
            queries, weights, self.dedup_queries, self.dedup_min_width
        )
        n_data = self.mesh.shape[DATA_AXIS]
        perm, chunks = plan_query_dispatch(
            queries, weights,
            hot_table_host=self.hot_table_host, hot_h=self.hot_h,
            has_scan=any("tokT" in b for b in self.buckets),
            route=self.route_cold,
            route_min_queries=self.route_min_queries,
            max_q=next_multiple(self._max_chunk(), 8 * n_data),
            q_align=8 * n_data,
            c0_units=chunk_c0_units(k),
        )
        return perm, chunks

    def _step_fn(self, k: int, q_pad: int, t_pad: int, *, weighted: bool,
                 split: bool, t_pad_c: int | None, ids_only: bool,
                 masked: bool, local_only: bool = False):
        """Compile-cached sharded step for one chunk configuration.

        The cache key and the ``make_sharded_ell_step`` kwargs are built
        in exactly one place so ``bench_step_fn`` and ``_dispatch`` can
        never drift and poison the shared ``self._cache`` (ADVICE r3).
        """
        from bm25_tpu.models.sparse import _score_sdt

        shapes = tuple(
            tuple((key, tuple(b[key].shape), str(b[key].dtype))
                  for key in sorted(b))
            for b in self.buckets
        )
        if self.k_local == "auto":
            kl = choose_k_local(k, self.mesh.shape[DOC_AXIS])
        else:
            kl = self.k_local
        key = (k, self.hot_h, q_pad, t_pad, shapes, weighted, split,
               t_pad_c, ids_only, self.score_dtype, kl, masked, local_only)
        fn = self._cache.get(key)
        if fn is None:
            fn = jax.jit(make_sharded_ell_step(
                self.mesh, k, self.hot_h, self.buckets,
                weighted=weighted, split_cold=split,
                score_dtype=None if ids_only else _score_sdt(
                    self.score_dtype),
                ids_only=ids_only, k_local=kl, masked=masked,
                local_only=local_only,
            ))
            self._cache[key] = fn
        return fn

    def bench_step_fn(self, queries: np.ndarray, top_k: int):
        """Compiled production step + device args for the FIRST planned
        chunk (unweighted, unmasked, scores+ids).

        The bench harness needs the raw jitted step for relay-proof
        dependency-chained timing (see ``bench/query_bench.py::
        measure_sharded_step_ms``).  Planning and compilation go through
        the same ``_plan``/``_step_fn`` helpers as ``_dispatch`` (incl.
        query dedup), so the timed chunk is exactly the production chunk
        and the compile cache is shared both ways.  Returns
        ``(fn, args, n_chunks)`` where ``args[1]`` is the padded (Q, T)
        query operand.
        """
        queries, _ = validate_query_batch(queries, self.vocab_size, None)
        k = min(top_k, self.num_docs)
        _, chunks = self._plan(queries, None, k)
        _cq, padded, wpadded, cold_padded, wc_padded = chunks[0]
        split = cold_padded is not None
        # dedup of a wide unweighted batch introduces count weights —
        # mirror _dispatch so the timed step is the production step
        weighted = wpadded is not None
        fn = self._step_fn(
            k, padded.shape[0], padded.shape[1], weighted=weighted,
            split=split,
            t_pad_c=None if cold_padded is None else cold_padded.shape[1],
            ids_only=False, masked=False,
        )
        qsh = NamedSharding(self.mesh, P(DATA_AXIS, None))
        args = [self.hot_table, jax.device_put(padded, qsh)]
        if split:
            args.append(jax.device_put(cold_padded, qsh))
        if weighted:
            args.append(jax.device_put(wpadded, qsh))
            if split:
                args.append(jax.device_put(wc_padded, qsh))
        return fn, (*args, *self.buckets), len(chunks)

    def _prepare_doc_mask(self, doc_mask):
        if doc_mask is None:
            return None
        m = np.asarray(doc_mask)
        if m.shape != (self.num_docs,):
            raise ValueError(
                f"doc_mask shape {m.shape} != ({self.num_docs},)"
            )
        # replicated: bucket rows interleave global ids, so the mask
        # cannot shard over the doc axis (gathered by did per shard)
        return jax.device_put(
            m.astype(bool), NamedSharding(self.mesh, P())
        )

    def _dispatch_batch(self, queries, k: int, weights, ids_only: bool,
                        dmask):
        """Plan + enqueue one query batch; returns unfetched device state.

        Starts ``copy_to_host_async`` on every result leaf so the d2h
        transfer begins the moment the device step finishes — the caller
        can keep dispatching while results stream back (same structure
        as ``SparseEngine._dispatch_batch``)."""
        masked = dmask is not None
        # dedup + cold-width routing + chunking through the shared
        # planner (models/sparse.py::plan_query_dispatch via _plan);
        # per-chip query slices must land on legal kernel tilings,
        # handled by _max_chunk.  Dedup of an unweighted wide batch
        # introduces count weights, so `weighted` reads off the plan.
        perm, chunks = self._plan(queries, weights, k)
        weighted = bool(chunks) and chunks[0][2] is not None
        if not ids_only and self._offsets_host is None:
            self._offsets_host = np.asarray(self.offsets)
        futures = []
        for cq, padded, wpadded, cold_padded, wc_padded in chunks:
            q_pad, t_pad = padded.shape
            split = cold_padded is not None
            t_pad_c = None if cold_padded is None else cold_padded.shape[1]
            fn = self._step_fn(
                k, q_pad, t_pad, weighted=weighted, split=split,
                t_pad_c=t_pad_c, ids_only=ids_only, masked=masked,
            )
            qsh = NamedSharding(self.mesh, P(DATA_AXIS, None))
            args = [self.hot_table, jax.device_put(padded, qsh)]
            if split:
                args.append(jax.device_put(cold_padded, qsh))
            if weighted:
                args.append(jax.device_put(wpadded, qsh))
                if split:
                    args.append(jax.device_put(wc_padded, qsh))
            if masked:
                args.append(dmask)
            out = fn(*args, *self.buckets)
            for leaf in (out if isinstance(out, tuple) else (out,)):
                leaf.copy_to_host_async()
            if ids_only:
                futures.append((cq, None, out))
                continue
            scores, docs = out
            # token offsets are doc-independent; add on host (padded ids'
            # pad slots map to offset row 0 with zero weight)
            valid = padded[:cq] >= 0
            off = self._offsets_host
            wv = wpadded[:cq] if weighted else 1.0
            qoff = (np.where(
                valid, off[np.where(valid, padded[:cq], 0)], 0.0
            ) * wv).sum(1)
            futures.append((cq, qoff, (docs, scores)))
        return perm, futures

    def _collect_batch(self, perm, futures, ids_only: bool, masked: bool):
        """Fetch + assemble one dispatched batch's results."""

        def unpermute(arr):
            if perm is None:
                return arr
            inv = np.argsort(perm, kind="stable")
            return arr[inv]

        if ids_only:
            # one batched fetch of every chunk's ids
            flat = jax.device_get([d for _, _, d in futures])
            docs = np.concatenate(
                [np.asarray(d)[:cq] for (cq, _, _), d in zip(futures, flat)]
            )
            return unpermute(docs)
        # one batched fetch of every chunk's (docs, scores) — faster than
        # the serial rate through the relay (same as SparseEngine); the
        # futures' transfers were already started at dispatch time
        flat = jax.device_get(
            [x for _, _, pair in futures for x in pair]
        )
        out_docs, out_scores = [], []
        for (cq, qoff, _), di, si in zip(futures, flat[0::2], flat[1::2]):
            d = np.asarray(di)[:cq]
            s = (np.asarray(si).astype(np.float32)[:cq]
                 + qoff[:, None]).astype(np.float32)
            if masked:
                # qoff is doc-independent and was just added to the doc -1
                # shortfall slots too; restore their score-0 contract
                s[d == -1] = 0.0
            out_docs.append(d)
            out_scores.append(s)
        return unpermute(np.concatenate(out_docs)), unpermute(
            np.concatenate(out_scores)
        )

    def _dispatch(self, queries, top_k, weights, ids_only: bool,
                  doc_mask=None):
        queries, weights = validate_query_batch(
            queries, self.vocab_size, weights
        )
        dmask = self._prepare_doc_mask(doc_mask)
        k = min(top_k, self.num_docs)
        if len(queries) == 0 or k <= 0:
            return empty_results(len(queries), k, ids_only=ids_only)
        perm, futures = self._dispatch_batch(queries, k, weights, ids_only,
                                             dmask)
        return self._collect_batch(perm, futures, ids_only,
                                   masked=dmask is not None)

    def search_pipelined(
        self, queries: np.ndarray, top_k: int = 100, batch: int = 512,
        weights: np.ndarray | None = None,
        doc_mask: np.ndarray | None = None, ids_only: bool = False,
    ):
        """Double-buffered large-batch search: batch i+1's sharded device
        step is dispatched BEFORE batch i's results are fetched, so one
        batch's d2h rides under the next batch's compute.  Same contract
        as :meth:`search` (ids only with ``ids_only``); mirrors
        ``SparseEngine.search_pipelined``.
        """
        queries, weights = validate_query_batch(
            queries, self.vocab_size, weights
        )
        dmask = self._prepare_doc_mask(doc_mask)
        masked = dmask is not None
        k = min(top_k, self.num_docs)
        if len(queries) == 0 or k <= 0:
            return empty_results(len(queries), k, ids_only=ids_only)
        out_docs, out_scores = [], []

        def collect(pending):
            res = self._collect_batch(*pending, ids_only, masked=masked)
            if ids_only:
                out_docs.append(res)
            else:
                out_docs.append(res[0])
                out_scores.append(res[1])

        pending = None
        for i in range(0, len(queries), batch):
            qb = queries[i : i + batch]
            wb = None if weights is None else weights[i : i + batch]
            dispatched = self._dispatch_batch(qb, k, wb, ids_only, dmask)
            if pending is not None:
                collect(pending)
            pending = dispatched
        collect(pending)
        docs = np.concatenate(out_docs)
        if ids_only:
            return docs
        return docs, np.concatenate(out_scores)


def dryrun_sharded_step(n_devices: int) -> None:
    """One full sharded query step on tiny shapes (driver dry-run hook).

    Exercises the real option surface: dense + sparse sharded engines,
    weighted queries, forced cold-width routing, budget-driven query
    chunking, and rankings-only search — all oracle-checked.
    """
    from bm25_tpu.scoring import build_scored_index

    rng = np.random.default_rng(0)
    ids = [
        rng.integers(0, 64, size=rng.integers(3, 12)).astype(np.int32)
        for _ in range(40)
    ]
    index = build_scored_index(ids, vocab_size=64)
    data = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    mesh = make_mesh(n_devices, data=data)
    engine = ShardedEngine.from_scored_index(index, mesh=mesh)
    queries = rng.integers(-1, 64, size=(9, 5), dtype=np.int32)
    docs, scores = engine.search(queries, top_k=7)
    assert docs.shape == (9, 7) and scores.shape == (9, 7)
    assert int(docs.max()) < index.num_docs

    # cross-check vs the host oracle
    from bm25_tpu.reference import ReferenceEngine

    od, os_ = ReferenceEngine.from_scored_index(index).search(queries, top_k=7)
    np.testing.assert_allclose(scores, os_, rtol=1e-5, atol=1e-6)

    # dense path with a budget small enough to force query chunking
    engine.score_buffer_budget = engine.st.shape[1] * 4 * 8 * data
    docs_c, scores_c = engine.search(queries, top_k=7)
    np.testing.assert_allclose(scores_c, os_, rtol=1e-5, atol=1e-6)

    # the doc-sharded ELL (large-corpus) path over the same mesh:
    # weighted + forced routing + chunked, plus rankings-only
    sp = ShardedSparseEngine.from_scored_index(index, mesh=mesh, hot_tokens=4)
    sp.route_cold = True
    sp.chunk_queries = 8 * data
    w = np.where(queries >= 0, 1.0, 0.0).astype(np.float32)
    docs2, scores2 = sp.search(queries, top_k=7, weights=w)
    np.testing.assert_allclose(np.sort(scores2, axis=1), np.sort(os_, axis=1),
                               rtol=1e-5, atol=1e-6)
    ids_only = sp.search_ids(queries, top_k=7)
    np.testing.assert_array_equal(ids_only, docs2)

    # filtered search over both sharded engines (replicated mask on the
    # ELL path, doc-sharded mask on the dense path)
    mask = rng.random(index.num_docs) < 0.5
    om, _ = ReferenceEngine.from_scored_index(index).search(
        queries, top_k=7, doc_mask=mask
    )
    dm, _ = engine.search(queries, top_k=7, doc_mask=mask)
    np.testing.assert_array_equal(dm == -1, om == -1)
    assert mask[dm[dm >= 0]].all()
    dm2, _ = sp.search(queries, top_k=7, doc_mask=mask)
    np.testing.assert_array_equal(dm2 == -1, om == -1)
    assert mask[dm2[dm2 >= 0]].all()

    # slot-tiled wide bucket under shard_map: a long-document corpus
    # whose widest ELL bucket exceeds SLOT_TILE adds a third grid axis
    # to the local-step kernel — validate the multi-chip composition
    # compiles and matches the oracle (BASELINE Wikipedia config class)
    from bm25_tpu.ops.ell_score import SLOT_TILE

    wvocab = 2048
    wdocs = [
        rng.integers(0, wvocab, size=int(n)).astype(np.int32)
        for n in rng.integers(3, 12, size=24)
    ] + [
        rng.choice(wvocab, size=SLOT_TILE + 104, replace=False)
        .astype(np.int32)
        for _ in range(4)
    ]
    widx = build_scored_index(wdocs, vocab_size=wvocab)
    wsp = ShardedSparseEngine.from_scored_index(
        widx, mesh=mesh, hot_tokens=0, max_buckets=2
    )
    widths = [b["tokT"].shape[0] for b in wsp.buckets if "tokT" in b]
    assert max(widths) > SLOT_TILE, f"bucket widths {widths} single-tile"
    wq = rng.integers(-1, wvocab, size=(6, 5), dtype=np.int32)
    wd, ws = wsp.search(wq, top_k=5)
    wod, wos = ReferenceEngine.from_scored_index(widx).search(wq, top_k=5)
    np.testing.assert_allclose(ws, wos, rtol=1e-5, atol=1e-6)

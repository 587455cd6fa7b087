"""Top-k kernel family: dispatcher, Pallas two-stage TPU kernel, fused sampling.

TPU re-design of the reference's crown-jewel kernel set
(``/root/reference/operations/topk.mojo``):

* ``top_k`` dispatcher with axis / largest / sorted options (``topk.mojo:109``)
* a **two-stage** large-N path: stage 1 extracts per-block top-k candidates,
  stage 2 merges ``num_blocks * k`` candidates (``topk.mojo:576-661`` /
  ``:670-830``, TRT-LLM style) — re-invented for TPU vector lanes: instead of
  warp shuffles, each stage runs k rounds of (row-max, first-argmax, mask)
  over a VMEM-resident tile, so ties deterministically pick the smaller index
  (the stability contract of ``_top_k_cpu``, ``topk.mojo:234-258``)
* ``top_k_fused_sampling``: top-k + temperature softmax sampling
  (``topk.mojo:271-407``), with JAX PRNG keys instead of a global seed.
* ``top_k_tree`` / ``select_top_k``: the production selectors — a branch-8
  tournament reduction whose merges are stable variadic sorts, the same
  two-stage idea scaled to corpus-sized axes (measured 53x ``lax.top_k``
  at k=1000 on (512, 524288); docs/design.md).

Dispatch (``implementation="auto"``): the tournament tree for large axes,
``lax.top_k`` for small ones; the literal two-stage Pallas kernel remains
available as ``implementation="pallas"``.  All paths share semantics and
are golden-tested against numpy oracles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bm25_tpu.ops.registry import register_op
from bm25_tpu.utils.padding import cdiv, next_multiple

NEG_INF = float("-inf")

# Pallas path limits (analog of the reference's block-size heuristic,
# topk.mojo:1019-1027 and <=8 blocks per input, :1079-1081)
_PALLAS_CHUNK = 16384
_PALLAS_MAX_BLOCKS = 16


# ---------------------------------------------------------------------------
# public dispatcher
# ---------------------------------------------------------------------------


def _auto_impl(n: int, k: int, rows: int) -> str:
    """Measured selector dispatch (scripts/exp_r4_topk_smallk.py).

    On-chip grid {8,32,128,512} rows x {65K..524K} cols x k in
    {1,8,16,32,64}, plus the round-2 large-k shapes.  lax.top_k's cost
    grows ~linearly in k but with a small constant; the tournament tree
    is nearly k-flat but pays per-level overheads that only amortize
    over enough rows.  Winners: lax for k < 8 everywhere; tree for
    k >= 64 (e.g. (512,524288) k=64: 10.2 vs 53.7 ms); between them the
    tree needs >= 128 rows to win ((128,65536) k=8: 0.21 vs 0.30 ms
    tree, but (32,524288) k=32: 1.75 vs 1.92 ms lax).  Worst mispredict
    on the grid is -6% ((512,524288) k=8).  The two-stage Pallas kernel
    never wins a cell (O(k) extraction rounds; k=1 at (128,65536) ties
    within noise) and stays opt-in.
    """
    if n > max(2 * k, 4096) and (k >= 64 or (k >= 8 and rows >= 128)):
        return "tree"
    return "lax"


def top_k(
    x: jax.Array,
    k: int,
    axis: int = -1,
    largest: bool = True,
    sorted: bool = True,  # noqa: A002 - mirrors the reference signature
    implementation: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Return (values, indices) of the k largest (or smallest) along ``axis``.

    Results are always sorted (descending for largest, ascending for
    smallest); ties resolve to the smaller index.  ``sorted=False`` is
    accepted for API parity and returns the sorted order (a valid instance
    of the unspecified-order contract).
    """
    x = jnp.asarray(x)
    if not 1 <= k <= x.shape[axis]:
        raise ValueError(f"k={k} out of range for axis of {x.shape[axis]}")
    axis = axis % x.ndim
    if axis != x.ndim - 1:
        x_moved = jnp.moveaxis(x, axis, -1)
        v, i = top_k(x_moved, k, -1, largest, sorted, implementation)
        return jnp.moveaxis(v, -1, axis), jnp.moveaxis(i, -1, axis)

    neg = not largest
    if neg:
        if not jnp.issubdtype(x.dtype, jnp.floating):
            # bitwise NOT is an exact, overflow-free order reversal for
            # two's-complement (and unsigned) ints — unlike -x, which wraps
            # at INT_MIN
            xs = ~x
        else:
            xs = -x
    else:
        xs = x

    impl = implementation
    if impl == "auto":
        n = x.shape[-1]
        impl = _auto_impl(n, k, x.size // max(n, 1))

    if impl == "lax":
        v, i = lax.top_k(xs, k)
    elif impl == "tree":
        v, i = top_k_tree(xs, k)
    elif impl == "pallas":
        if not jnp.issubdtype(xs.dtype, jnp.floating):
            # the kernel masks with float -inf; an int tile would silently
            # promote inside the kernel and dtype-mismatch the output ref
            raise TypeError(
                "implementation='pallas' supports float inputs only; use "
                "'tree' or 'lax' for integer top-k"
            )
        v, i = _pallas_topk_lastaxis(xs, k)
    else:
        raise ValueError(f"unknown implementation {implementation!r}")

    if neg:
        v = ~v if not jnp.issubdtype(x.dtype, jnp.floating) else (-v).astype(x.dtype)
    return v, i


register_op("top_k")(top_k)


# ---------------------------------------------------------------------------
# Pallas two-stage kernel (TPU)
# ---------------------------------------------------------------------------


def _extract_topk_rounds(x, col_ids, k, vals_ref, idxs_ref, taken0=None):
    """k rounds of (row max, first argmax, mask out) over a VMEM tile.

    Writes one (rows,) column of vals/idxs per round.  argmax returns the
    first maximal position -> smaller original index wins ties.

    A row exhausted mid-way (fewer than k entries above -inf) would make
    argmax return position 0 forever, emitting DUPLICATE indices — instead
    the round falls back to the first not-yet-taken selectable position,
    matching lax.top_k's distinct-indices contract.  ``taken0`` marks
    positions that are never selectable (tail-chunk padding).
    """
    if taken0 is None:
        taken0 = jnp.zeros(x.shape, dtype=bool)
    # Three Mosaic hardware-legality constraints shape this loop (each
    # raised a compile error on-chip; interpret mode accepted them all):
    #  * no i1 vector loop carries (scf.for fails to legalize) — the
    #    taken mask is carried as f32, 0.0 = open / -1.0 = taken, which
    #    is ALSO exactly the argmax operand first_open needs (argmax
    #    lowering is f32-only: bool/int vectors raise NotImplementedError)
    #  * no dynamic-lane column stores (vals_ref[:, i] = m emits a
    #    vector<rx1> tpu.vector_store the backend rejects) — results
    #    accumulate in register tiles via one-hot selects and store once
    #    at the end; the full-width init also covers stage-1's 128-lane
    #    output padding (NEG_INF / id 0 = losing candidates for stage 2)
    #  * no 1-column take_along_axis (the gather rule asserts
    #    indices.shape == input.shape + (1,)) — exactly one position per
    #    row is hot, so a one-hot select + sum reads the selected id
    takenf0 = jnp.where(taken0, jnp.float32(-1.0), jnp.float32(0.0))
    out_col = lax.broadcasted_iota(jnp.int32, vals_ref.shape, 1)
    vals0 = jnp.full(vals_ref.shape, NEG_INF, x.dtype)
    idxs0 = jnp.zeros(idxs_ref.shape, jnp.int32)

    def body(i, carry):
        cur, takenf, vals, idxs = carry
        m = jnp.max(cur, axis=1)
        am = jnp.argmax(cur, axis=1)
        # takenf is all -1.0 only when every selectable position was
        # taken; argmax then returns 0, which is at least in range
        first_open = jnp.argmax(takenf, axis=1)
        am = jnp.where(jnp.isneginf(m), first_open, am)
        onehot = (
            lax.broadcasted_iota(jnp.int32, cur.shape, 1) == am[:, None]
        )
        sel = jnp.sum(jnp.where(onehot, col_ids, 0), axis=1)
        hit = out_col == i
        vals = jnp.where(hit, m[:, None], vals)
        idxs = jnp.where(hit, sel[:, None], idxs)
        return (
            jnp.where(onehot, NEG_INF, cur),
            jnp.where(onehot, jnp.float32(-1.0), takenf),
            vals,
            idxs,
        )

    _, _, vals, idxs = lax.fori_loop(
        0, k, body, (x, takenf0, vals0, idxs0), unroll=False
    )
    vals_ref[:] = vals
    idxs_ref[:] = idxs


def _stage1_kernel(n_real: int, chunk: int, k: int, kp: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    def kernel(x_ref, vals_ref, idxs_ref):
        j = pl.program_id(1)
        x = x_ref[:]
        base = j * chunk
        col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        # mask the tail chunk's padding (also 'taken': never selectable,
        # so an exhausted row's fallback picks real columns first)
        pad = base + col >= n_real
        x = jnp.where(pad, NEG_INF, x)
        # the output block is 128-lane-padded for Mosaic when kp != k;
        # _extract_topk_rounds' full-width register init fills the pad
        # lanes with losing candidates (NEG_INF / id 0) for stage 2
        ids = jnp.minimum(base + col, n_real - 1)  # in-range even for pads
        _extract_topk_rounds(x, ids, k, vals_ref, idxs_ref, taken0=pad)

    return kernel


def _stage2_kernel(k: int, kp: int):
    import jax.experimental.pallas as pl  # noqa: F401

    def kernel(cand_vals_ref, cand_idxs_ref, vals_ref, idxs_ref):
        x = cand_vals_ref[:]
        # stage-1's 128-lane output padding (positions kp*j + [k, kp)) is
        # never selectable
        col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        pad = col % kp >= k
        _extract_topk_rounds(x, cand_idxs_ref[:], k, vals_ref, idxs_ref,
                             taken0=pad)

    return kernel


@functools.partial(jax.jit, static_argnums=(1,))
def _pallas_topk_lastaxis(x: jax.Array, k: int):
    """Two-stage Pallas top-k over the last axis of a float array."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    n = orig_shape[-1]
    b = int(np.prod(orig_shape[:-1], dtype=np.int64)) if x.ndim > 1 else 1
    x2 = x.reshape(b, n)

    chunk = min(_PALLAS_CHUNK, next_multiple(n, 128))
    nblocks = min(cdiv(n, chunk), _PALLAS_MAX_BLOCKS)
    chunk = next_multiple(cdiv(n, nblocks), 128)
    nblocks = cdiv(n, chunk)
    if nblocks > 1 and k > chunk:
        # a chunk narrower than k cannot supply k DISTINCT candidates:
        # stage 1's exhausted-row fallback would repeat positions and a
        # row with < k finite values could surface duplicate indices in
        # the merged output, breaking the lax.top_k distinct-indices
        # contract.  The tree path has no such width coupling.
        return top_k_tree(x, k)
    n_pad = chunk * nblocks
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, 0), (0, n_pad - n)), constant_values=NEG_INF)

    row_tile = 8
    b_pad = next_multiple(b, row_tile)
    if b_pad != b:
        x2 = jnp.pad(x2, ((0, b_pad - b), (0, 0)), constant_values=NEG_INF)

    # interpreter mode lets the same kernels run (and be tested) on CPU
    interpret = jax.devices()[0].platform != "tpu"

    # Mosaic's last-dim block rule: a block's lane width must be
    # 128-divisible or the full array dim.  With nblocks == 1 the stage-1
    # output block IS the full dim (any k legal); with nblocks > 1 each
    # block writes its own k-slice, so the slice pads to a 128 multiple
    kp = k if nblocks == 1 else next_multiple(k, 128)

    grid = (b_pad // row_tile, nblocks)
    cand_vals, cand_idxs = pl.pallas_call(
        _stage1_kernel(n, chunk, k, kp),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((row_tile, chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((row_tile, kp), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, kp), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, nblocks * kp), x2.dtype),
            jax.ShapeDtypeStruct((b_pad, nblocks * kp), jnp.int32),
        ),
    )(x2)

    if nblocks == 1:
        vals, idxs = cand_vals, cand_idxs
    else:
        vals, idxs = pl.pallas_call(
            _stage2_kernel(k, kp),
            grid=(b_pad // row_tile,),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((row_tile, nblocks * kp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((row_tile, nblocks * kp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b_pad, k), x2.dtype),
                jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
            ),
        )(cand_vals, cand_idxs)

    vals = vals[:b]
    idxs = idxs[:b]
    out_shape = orig_shape[:-1] + (k,)
    return vals.reshape(out_shape), idxs.reshape(out_shape)


# ---------------------------------------------------------------------------
# tournament-tree exact top-k (large k, huge N)
# ---------------------------------------------------------------------------


def _sorted_topk(vals: jax.Array, idx: jax.Array, k: int):
    """(vals, idx) -> k largest, sorted desc, ties by candidate order.

    Uses a stable variadic ``lax.sort`` on order-reversed values carrying
    the index operand — measured ~50x faster than ``lax.top_k`` for k=1000
    on TPU v5e (see docs/design.md).  Integer inputs reverse via bitwise
    NOT (exact for the whole range, including the INT_MIN padding
    ``_tree_level`` inserts — negation would wrap INT_MIN back onto itself
    and let pad slots win).
    """
    if jnp.issubdtype(vals.dtype, jnp.floating):
        nv, ni = lax.sort((-vals, idx), num_keys=1, is_stable=True)
        return -nv[:, :k], ni[:, :k]
    nv, ni = lax.sort((~vals, idx), num_keys=1, is_stable=True)
    return ~nv[:, :k], ni[:, :k]


def _tree_level(x2: jax.Array, k: int, branch: int, base: int,
                maxes: jax.Array | None = None):
    """Recursive top-k over the last axis of (B, N) via branch-wide maxima.

    Same superset argument as top_k_blockwise (at most k-1 blocks can rank
    strictly above the k-th value's block) applied recursively with a tiny
    branch factor, so every merge works on only ``branch * k`` candidates
    instead of ``block * k``.  Stable sorts + index-ordered candidates at
    every level -> ties resolve to the smaller original index.

    ``maxes``, when given, supplies the first level's group maxima
    precomputed (e.g. by the fused scoring kernel's epilogue); N must
    then already be a multiple of ``branch``.
    """
    b, n = x2.shape
    if n <= base or n // branch < k:
        # too small for group preselection; precomputed maxes can't help
        iota = jnp.broadcast_to(
            lax.broadcasted_iota(jnp.int32, (1, n), 1), x2.shape
        )
        return _sorted_topk(x2, iota, k)
    if maxes is None:
        n_pad = next_multiple(n, branch)
        if n_pad != n:
            if jnp.issubdtype(x2.dtype, jnp.floating):
                lowest = NEG_INF
            elif x2.dtype == jnp.bool_:
                lowest = False  # jnp.iinfo rejects bool
            else:
                lowest = jnp.iinfo(x2.dtype).min
            x2 = jnp.pad(x2, ((0, 0), (0, n_pad - n)), constant_values=lowest)
        groups = x2.reshape(b, n_pad // branch, branch)
        maxes = jnp.max(groups, axis=-1)  # (b, n/branch)
    else:
        assert n % branch == 0, (n, branch)
        groups = x2.reshape(b, n // branch, branch)
    _, top_groups = _tree_level(maxes, k, branch, base)  # indices into groups
    top_groups = jnp.sort(top_groups, axis=1)  # index order for tie contract
    cand = jnp.take_along_axis(groups, top_groups[:, :, None], axis=1)
    cand = cand.reshape(b, k * branch)
    cand_idx = (
        top_groups[:, :, None] * branch + jnp.arange(branch)[None, None, :]
    ).reshape(b, k * branch)
    return _sorted_topk(cand, cand_idx, k)


def top_k_tree(
    x: jax.Array, k: int, branch: int = 8, base: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over a huge last axis (tournament reduction + sort merges).

    Measured on TPU v5e at (512, 524288): k=1000 in 45 ms vs 2394 ms for
    ``lax.top_k`` (53x) and k=100 in 22 ms vs 150 ms for the one-level
    block-max scheme.  Total merge work is ``depth`` stable sorts of
    ``branch * k`` and the max-reductions stream a geometrically shrinking
    series (~1.14x the input).
    """
    orig_shape = x.shape
    n = orig_shape[-1]
    if not 1 <= k <= n:
        raise ValueError(f"k={k} out of range for axis of {n}")
    if base is None:
        base = max(2 * k, 4096)
    b = int(np.prod(orig_shape[:-1], dtype=np.int64)) if x.ndim > 1 else 1
    vals, idx = _tree_level(x.reshape(b, n), k, branch, base)
    out_shape = orig_shape[:-1] + (k,)
    return vals.reshape(out_shape), idx.reshape(out_shape)


register_op("top_k_tree")(top_k_tree)


def select_top_k(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Best exact top-k strategy for (batch, N) score matrices.

    Exactly ``top_k``'s auto dispatch — one threshold, not two drifting
    copies.  NB: NaN ordering differs between the underlying paths
    (lax.top_k ranks NaN largest; the tree's sort ranks it smallest), so
    callers must mask non-finite scores first — every engine does.
    """
    return top_k(x, k)


register_op("select_top_k")(select_top_k)


def top_k_tree_with_maxes(
    x2: jax.Array, maxes: jax.Array, k: int, branch: int = 8,
    base: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """``top_k_tree`` whose first tournament level is precomputed.

    ``maxes[b, g] = max(x2[b, g*branch : (g+1)*branch])`` — typically
    emitted by the fused scoring kernel's epilogue (ops.ell_score.
    ell_score_fused), so the tree never streams the full (B, N) base; it
    only reads ``maxes`` (N/branch) plus the k selected groups.  Tie
    contract identical to ``top_k_tree`` (maxes carry no positions, the
    group gather + stable final sort resolve ties to the smaller index).
    """
    b, n = x2.shape
    if not 1 <= k <= n:
        raise ValueError(f"k={k} out of range for axis of {n}")
    if n % branch or maxes.shape != (b, n // branch):
        raise ValueError(
            f"maxes shape {maxes.shape} does not match branch-{branch} "
            f"groups of {x2.shape}"
        )
    if base is None:
        base = max(2 * k, 4096)
    return _tree_level(x2, k, branch, base, maxes=maxes)


register_op("top_k_tree_with_maxes")(top_k_tree_with_maxes)


DOC_SENTINEL = np.int32(2**31 - 1)


def union_group_select(
    gmaxes: list[jax.Array],  # per bucket (Q, rows_b / branch) group maxima
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """ONE global group tournament across every bucket's group maxima.

    Instead of a full top-k tree per bucket plus a cross-bucket merge
    (cost: ``buckets * (tree + gather + sort)``), run a single tournament
    over the CONCATENATED group maxima.  Returns ``(gpos, ok)``: the
    (Q, k) winning group positions in concatenated group space, and a
    scalar exactness flag.

    Exactness: let theta be the k-th largest group max.  Every unselected
    group has gmax <= the (k+1)-th max; when ``ok`` (the (k+1)-th max is
    STRICTLY below theta, checked per query and AND-reduced) every doc
    outside the selected groups scores < theta, while the k selected
    groups contribute >= k distinct docs scoring >= theta — so the true
    k-th score >= theta and no outside doc can reach the top-k even via
    ties.  When a tie straddles the k-boundary of the group maxima
    (``ok`` False — e.g. planted duplicate docs), the caller must fall
    back to the exact per-bucket path; this keeps the degenerate-tie
    rescue OFF the common path (the round-2 union prototype paid an
    unconditional full-base rescue pass and lost, NOTES.md finding 12).

    The reference's two-stage shape (``topk.mojo:576-830``) taken to its
    limit: stage 1 is the kernels' fused group maxima, stage 2 is one
    global merge instead of one per bucket.
    """
    gm = jnp.concatenate(gmaxes, axis=1)  # (Q, G_total)
    gv, gpos = top_k_tree(gm, k + 1)
    theta = gv[:, k - 1]
    # strict gap between the k-th and (k+1)-th group max for every query
    ok = jnp.all(gv[:, k] < theta)
    return gpos[:, :k], ok


register_op("union_group_select")(union_group_select)


def gather_group_candidates(
    bases: list[jax.Array],  # per bucket (Q, rows_b) f32, pads = -inf
    dids: list[jax.Array],  # per bucket (rows_b,) int32 doc ids, -1 pads
    gpos: jax.Array,  # (Q, k) winning group positions (concatenated space)
    branch: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Flat (Q, k*branch) candidate (values, doc_ids) of the won groups.

    Each bucket contributes the groups whose concatenated position lands
    in its range; sentinel slots and pad rows are masked to -inf so one
    final two-key (score desc, doc asc) sort yields the exact top-k with
    the smaller-doc-id tie contract (doc ids are carried explicitly —
    no positional-stability requirement, so ``gpos`` needs no re-sort).
    """
    q, k = gpos.shape
    vals = jnp.full((q, k, branch), NEG_INF, jnp.float32)
    docs = jnp.full((q, k, branch), DOC_SENTINEL, jnp.int32)
    off = 0
    for base, did in zip(bases, dids):
        gb = base.shape[1] // branch
        b3 = base.reshape(q, gb, branch)
        dg = did.reshape(gb, branch)
        rel = gpos - off
        in_b = (rel >= 0) & (rel < gb)
        relc = jnp.clip(rel, 0, gb - 1)
        v = jnp.take_along_axis(b3, relc[:, :, None], axis=1)
        d = jnp.take(dg, relc, axis=0)
        vals = jnp.where(in_b[:, :, None], v, vals)
        docs = jnp.where(in_b[:, :, None], d, docs)
        off += gb
    flat_v = vals.reshape(q, k * branch)
    flat_d = docs.reshape(q, k * branch)
    # pad rows (doc -1) and unfilled sentinel slots can never win
    flat_v = jnp.where((flat_d < 0) | (flat_d == DOC_SENTINEL),
                       NEG_INF, flat_v)
    return flat_v, flat_d


register_op("gather_group_candidates")(gather_group_candidates)


# ---------------------------------------------------------------------------
# hierarchical (block-max) exact top-k for huge N
# ---------------------------------------------------------------------------


def top_k_blockwise(
    x: jax.Array, k: int, block: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over a huge last axis via block-max pre-selection.

    Two-level scheme: (1) reduce to per-block maxima, (2) pick the k
    highest-max blocks per row (at most k-1 blocks can have a max above the
    k-th value's block, so the true top-k values all live in those blocks),
    (3) gather the selected blocks and run the final exact top-k.

    Tie contract is preserved: blocks are index-ordered and ``lax.top_k``
    is stable, so among equal scores earlier blocks (= smaller indices) are
    selected first, and the final top-k inherits smaller-index-first order.

    Wins when ``k * block << N`` — the regime of BM25 serving (N = millions
    of docs); the same shape as the reference's two-stage GPU kernel
    (``topk.mojo:576-830``) but with the block count chosen by math, not
    hardware limits.
    """
    orig_shape = x.shape
    n = orig_shape[-1]
    if not 1 <= k <= n:
        raise ValueError(f"k={k} out of range for axis of {n}")
    if block is None:
        # minimize k*block + n/block -> block ~ sqrt(n/k), lane-aligned
        block = max(128, next_multiple(int(np.sqrt(n / k)), 128))
    nb = cdiv(n, block)
    if nb <= k:  # no reduction possible; plain top-k
        return top_k(x, k)

    b = int(np.prod(orig_shape[:-1], dtype=np.int64)) if x.ndim > 1 else 1
    x2 = x.reshape(b, n)
    n_pad = nb * block
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, 0), (0, n_pad - n)), constant_values=NEG_INF)

    block_max = jnp.max(x2.reshape(b, nb, block), axis=-1)  # (b, nb)
    _, top_blocks = lax.top_k(block_max, k)  # (b, k), stable
    # re-sort selected block ids ascending so the candidate axis is in
    # global index order — stable top_k below then resolves ties to the
    # smallest original index, preserving the tie contract.
    top_blocks = jnp.sort(top_blocks, axis=1)
    # gather selected blocks: (b, k, block)
    gathered = jnp.take_along_axis(
        x2.reshape(b, nb, block), top_blocks[:, :, None], axis=1
    )
    cand = gathered.reshape(b, k * block)
    cand_idx = (top_blocks[:, :, None] * block + jnp.arange(block)[None, None, :]
                ).reshape(b, k * block)
    vals, pos = lax.top_k(cand, k)
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    out_shape = orig_shape[:-1] + (k,)
    return vals.reshape(out_shape), idx.reshape(out_shape)


register_op("top_k_blockwise")(top_k_blockwise)


# ---------------------------------------------------------------------------
# fused top-k sampling
# ---------------------------------------------------------------------------


def _pallas_gumbel_choice(logits: jax.Array, seed) -> jax.Array:
    """Sample one index per row from softmax(logits) on-chip.

    Gumbel-max with the TPU PRNG (``pltpu.prng_seed`` /
    ``prng_random_bits``): z = logits + Gumbel noise, take argmax — the
    on-chip analog of the reference's fused stage-2 sampling
    (``topk.mojo:742-830``).  logits: (B, k), already temperature-scaled;
    returns (B,) int32 choices.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k = logits.shape
    b_pad = next_multiple(b, 8)
    k_pad = next_multiple(k, 128)
    if (b_pad, k_pad) != (b, k):
        logits = jnp.pad(
            logits, ((0, b_pad - b), (0, k_pad - k)), constant_values=NEG_INF
        )

    def kernel(seed_ref, logits_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        # on hardware prng_random_bits yields signed int32 lanes: bitcast to
        # uint32 BEFORE shifting, or the arithmetic shift produces negative
        # "uniforms" -> log(negative) = NaN -> garbage argmax (found on-chip;
        # the interpreter returns unsigned bits and hides it)
        bits = pltpu.bitcast(pltpu.prng_random_bits(logits_ref.shape),
                             jnp.uint32)
        # uniform in (0, 1): logical-shift the top 24 bits as uint32, then
        # bitcast to (now positive) int32 — Mosaic has no uint32->f32 cast
        top24 = pltpu.bitcast(bits >> 8, jnp.int32)
        u = top24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
        g = -jnp.log(-jnp.log(u))
        z = logits_ref[:] + g
        choice = jnp.argmax(z, axis=1).astype(jnp.int32)
        out_ref[:] = jnp.broadcast_to(choice[:, None], out_ref.shape)

    # TPU-specific PRNG primitives need the TPU interpreter off-chip (the
    # generic interpreter has no lowering for prng_seed)
    interpret = (
        pltpu.InterpretParams()
        if jax.devices()[0].platform != "tpu"
        else False
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 128), jnp.int32),
        interpret=interpret,
    )(jnp.asarray([seed], dtype=jnp.int32).reshape(1), logits)
    return out[:b, 0]


def top_k_fused_sampling(
    key: jax.Array,
    x: jax.Array,
    k: int,
    temperature: float | jax.Array = 1.0,
    axis: int = -1,
    implementation: str = "jax",
) -> tuple[jax.Array, jax.Array]:
    """Top-k + temperature softmax sampling of one index per row.

    Semantics of ``top_k_fused_sampling_cpu`` / ``_top_k_sampling``
    (``/root/reference/operations/topk.mojo:271-407``): select the k largest,
    softmax over ``(v - max) / max(temperature, 1e-6)``, sample one; returns
    ``(topk_values, sampled_index)`` where the sampled index has size 1 on
    ``axis`` (out_idxs shape convention of the reference test harness,
    ``/root/reference/test_topk.mojo:64-77``).  ``temperature -> 0`` becomes
    greedy argmax.
    """
    vals, idxs = top_k(x, k, axis=axis, largest=True)
    axis = axis % x.ndim
    vals_last = jnp.moveaxis(vals, axis, -1)
    idxs_last = jnp.moveaxis(idxs, axis, -1)
    t = jnp.maximum(jnp.asarray(temperature, vals_last.dtype), 1e-6)
    logits = (vals_last - vals_last[..., :1]) / t
    if implementation == "pallas":
        # on-chip Gumbel-max sampling with the TPU PRNG; `key` provides the
        # seed (its first lane), giving deterministic per-seed draws
        batch_shape = logits.shape[:-1]
        flat = logits.astype(jnp.float32).reshape(-1, logits.shape[-1])
        # fold the whole key into one seed lane (key[0] alone is 0 for all
        # small PRNGKeys); key_data unwraps new-style typed keys
        # (jax.random.key), whose dtype forbids astype
        kd = jnp.asarray(key)
        if jnp.issubdtype(kd.dtype, jax.dtypes.prng_key):
            kd = jax.random.key_data(kd)
        kd = kd.reshape(-1).astype(jnp.uint32)
        seed = jax.lax.reduce_xor(kd * jnp.uint32(2654435761), axes=(0,))
        seed = seed.astype(jnp.int32)
        choice = _pallas_gumbel_choice(flat, seed).reshape(batch_shape)
    elif implementation == "jax":
        choice = jax.random.categorical(key, logits.astype(jnp.float32), axis=-1)
    else:
        raise ValueError(f"unknown implementation {implementation!r}")
    sampled = jnp.take_along_axis(idxs_last, choice[..., None], axis=-1)
    return vals, jnp.moveaxis(sampled, -1, axis)


register_op("top_k_fused_sampling")(top_k_fused_sampling)

"""Fused Pallas ELL scoring kernel: membership-count postings scan.

The sparse engine's hot loop — ``score[q, d] = sum_l val[d, l] * #{t :
ids[q, t] == tok[d, l]}`` — as a single Pallas kernel.  Layout is
slot-major (``tokT[L, rows]``): a postings slot is one lane-major row, so
the (query x doc) accumulator tile broadcasts against it directly on the
VPU with no transposes and no materialized (Q, B, T) intermediates (the
XLA fallback's weakness).  Per grid cell the kernel runs L x T fused
compare-select-accumulate steps on a VMEM-resident (TQ, BR) tile.

This is the TPU re-invention of the reference's fused gather_reduce /
scoring loop (``/root/reference/operations/gather_scatter.mojo:116-281``)
for the padded-postings layout; cost = O(D*L*T) VPU ops, traffic = one
streaming pass over the postings.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from bm25_tpu.utils.padding import cdiv, next_multiple

# doc-rows per tile (lane axis of the accumulator)
BLOCK_ROWS = 512
# queries per tile (sublane axis); measured on v5e at bench shapes
# (512K docs, 4 buckets, T=8): TQ=128 runs ~5% faster than 256 (60.1 vs
# 63.4 ms/512-query batch), 512 is slower; BR=1024/2048 don't beat 512
BLOCK_Q = 128
# postings slots per scan-loop iteration (see _ell_accumulate)
UNROLL = 2
# slot-axis tile for wide buckets: a bucket's slot blocks are
# 2 x l_tile x BLOCK_ROWS x 4 B double-buffered in VMEM, so an unbounded
# bucket width (long documents -> wide ELL rows) would exceed VMEM and
# fail at compile.  Buckets at or below SLOT_TILE keep the exact
# single-tile kernel every benched shape runs (l_pad <= ~100 at the
# 512K/8.84M-doc configs); wider buckets accumulate over slot tiles
SLOT_TILE = 512


def _slot_tiling(l_pad: int) -> tuple[int, int]:
    """(l_tile, l_tiles) for a bucket of padded width l_pad.

    Tiles are BALANCED, not fixed-width: the scan covers l_tile*l_tiles
    slots (the bucket is padded up to it), so fixed SLOT_TILE tiles
    would scan up to SLOT_TILE-1 dead slots — measured +16% on the
    long-document shape, where the widest bucket (1208 slots) padded to
    3x512=1536.  Picking the tile count first and sizing tiles evenly
    (8-aligned) bounds the waste to <8 slots per tile: 1208 -> 3x408 =
    1224 scanned.  l_tile never exceeds SLOT_TILE, so the VMEM bound
    that motivated tiling is preserved.
    """
    assert SLOT_TILE % 8 == 0, (
        f"SLOT_TILE={SLOT_TILE} must be 8-aligned (balanced tiles are "
        "8-quantized and capped at SLOT_TILE)")
    if l_pad <= SLOT_TILE:
        return l_pad, 1
    n = cdiv(l_pad, SLOT_TILE)
    l_tile = next_multiple(cdiv(l_pad, n), 8)
    return l_tile, cdiv(l_pad, l_tile)


def max_hot_for_vmem(l_pad: int, vmem_bytes: int = 12 << 20,
                     tq: int = BLOCK_Q) -> int:
    """Largest hot-tier width H whose fused-kernel grid cell fits VMEM.

    Per-cell footprint (inputs double-buffered by the pipeline): slot
    blocks 2 (tok+val) x l_tile x BLOCK_ROWS x 4 B, hot row blocks
    2 (hi+lo) x H x BLOCK_ROWS x 2 B, per-query hot-count blocks up to
    2 x tq x H x 2 B, plus the (tq, BLOCK_ROWS) f32 accumulator and the
    transposed group maxima.  The 12 MB default leaves ~4 MB of v5e's
    VMEM for Mosaic scratch/semaphores.
    """
    # worst-case slot width over ANY bucket the build can produce under
    # this l_pad, NOT the balanced tiling of l_pad itself: balanced tiles
    # are non-monotonic in width (l_pad=1032 tiles at 344 while a
    # narrower 1024-wide bucket tiles at 512), so modeling the exact
    # tiling of the max doc nnz would inflate the hot cap past what a
    # different bucket's wider tile leaves room for
    l_tile = min(next_multiple(max(l_pad, 1), 8), SLOT_TILE)
    slot = 2 * 2 * l_tile * BLOCK_ROWS * 4
    fixed = tq * BLOCK_ROWS * 4 * 2 + (BLOCK_ROWS // GROUP) * tq * 4 * 2
    rem = vmem_bytes - slot - fixed
    per_h = 2 * 2 * BLOCK_ROWS * 2 + 2 * 2 * tq * 2
    return max(int(rem // per_h), 0)


def _ell_accumulate(ids, tokT_ref, valT_ref, t_count: int, l_count: int,
                    shape, w=None):
    """The membership-count scan: returns the (TQ, BR) f32 accumulator.

    ``w`` (TQ, T) f32, when given, weights each query token's matches
    (3T+2 VPU ops per slot instead of 2T+2) — the mechanism behind both
    weighted queries and long-query dedup (unique tokens x counts).
    """
    # process UNROLL postings slots per loop iteration: 2 measured 1.19x
    # over 1 on v5e (19.75 -> 16.57 ms per 48x131072 bucket call) — enough
    # ILP to cover the loop-carried accumulator dependency without the
    # register pressure of a full unroll (which measured SLOWER in round 1);
    # deeper static unrolls measured neutral-to-worse (scripts/exp_unroll.py)
    unroll = UNROLL if l_count % UNROLL == 0 else (
        2 if l_count % 2 == 0 else 1)

    def per_iter(l0, acc):
        for dl in range(unroll):
            l = l0 * unroll + dl
            tok_row = tokT_ref[l, :][None, :]  # (1, BR)
            val_row = valT_ref[l, :][None, :]  # (1, BR)
            if w is None:
                # count matches across T first (int adds), multiply once:
                # 2T+2 VPU ops per slot instead of 3T
                cnt = (ids[:, 0][:, None] == tok_row).astype(jnp.int32)
                for t in range(1, t_count):  # T is small and static
                    cnt = cnt + (ids[:, t][:, None] == tok_row)
                acc = acc + cnt.astype(jnp.float32) * val_row
            else:
                wsum = jnp.where(
                    ids[:, 0][:, None] == tok_row, w[:, 0][:, None], 0.0
                )
                for t in range(1, t_count):
                    wsum = wsum + jnp.where(
                        ids[:, t][:, None] == tok_row, w[:, t][:, None], 0.0
                    )
                acc = acc + wsum * val_row
        return acc

    acc0 = jnp.zeros(shape, jnp.float32)
    return lax.fori_loop(0, l_count // unroll, per_iter, acc0)


def _kernel_body(t_count: int, l_tile: int, l_tiles: int = 1):
    import jax.experimental.pallas as pl  # noqa: F401

    def kernel(ids_ref, tokT_ref, valT_ref, out_ref):
        ids = ids_ref[:]  # (TQ, T) int32; pads already mapped to -2
        acc = _ell_accumulate(
            ids, tokT_ref, valT_ref, t_count, l_tile, out_ref.shape
        )
        if l_tiles == 1:
            out_ref[:] = acc
            return
        # slot-tiled wide bucket: accumulate tile partials into the
        # revisited output block (grid's innermost axis walks the tiles)
        li = pl.program_id(2)

        @pl.when(li == 0)
        def _init():
            out_ref[:] = acc

        @pl.when(li > 0)
        def _add():
            out_ref[:] = out_ref[:] + acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def ell_score_pallas(
    ids: jax.Array,  # (Q, T) int32, pads/OOV < 0
    tokT: jax.Array,  # (L_pad, rows) int32, PAD_TOK (-1) padded
    valT: jax.Array,  # (L_pad, rows) float32
    interpret: bool = False,
) -> jax.Array:
    """Score one ELL bucket: returns (Q, rows) float32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, t = ids.shape
    l_pad, rows = tokT.shape
    assert rows % BLOCK_ROWS == 0, rows
    if valT.dtype != jnp.float32:
        # bf16 sublane tiling (16, 128) breaks the kernel's dynamic
        # single-row slot indexing on hardware ("index in dimension 0 is a
        # multiple of 8" Mosaic error); keep bf16 as the storage format but
        # upcast transiently for the scan.  Native bf16 slots = round-2.
        valT = valT.astype(jnp.float32)
    q_pad = next_multiple(q, 8)
    tq = min(BLOCK_Q, q_pad)
    while q_pad % tq:
        tq //= 2
    if q_pad != q:
        ids = jnp.pad(ids, ((0, q_pad - q), (0, 0)), constant_values=-1)
    # query pads -> -2 so they never match doc pad slots (-1)
    ids = jnp.where(ids >= 0, ids, -2)

    l_tile, l_tiles = _slot_tiling(l_pad)
    if l_tiles > 1:
        lp = l_tiles * l_tile
        # pad slots: tok -1 never matches a query id (>= 0 or -2), val 0
        tokT = jnp.pad(tokT, ((0, lp - l_pad), (0, 0)), constant_values=-1)
        valT = jnp.pad(valT, ((0, lp - l_pad), (0, 0)))

    if l_tiles == 1:
        grid = (q_pad // tq, rows // BLOCK_ROWS)
        q_map = lambda qi, ri: (qi, 0)  # noqa: E731
        slot_map = lambda qi, ri: (0, ri)  # noqa: E731
        out_map = lambda qi, ri: (qi, ri)  # noqa: E731
    else:
        grid = (q_pad // tq, rows // BLOCK_ROWS, l_tiles)
        q_map = lambda qi, ri, li: (qi, 0)  # noqa: E731
        slot_map = lambda qi, ri, li: (li, ri)  # noqa: E731
        out_map = lambda qi, ri, li: (qi, ri)  # noqa: E731
    out = pl.pallas_call(
        _kernel_body(t, l_tile, l_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, t), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((l_tile, BLOCK_ROWS), slot_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_tile, BLOCK_ROWS), slot_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, BLOCK_ROWS), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, rows), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * rows * l_pad * t,
            bytes_accessed=(tokT.nbytes + valT.nbytes) * (q_pad // tq)
            + q_pad * rows * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids, tokT, valT)
    return out[:q]


# group width of the fused epilogue's first-level maxima (must match the
# tournament tree's branch factor, ops.topk.top_k_tree)
GROUP = 8
NEG_INF = float("-inf")


def _fused_kernel_body(t_count: int, l_tile: int, has_hot: bool,
                       weighted: bool, split_counts: bool,
                       l_tiles: int = 1):
    import jax.experimental.pallas as pl  # noqa: F401

    def kernel(*refs):
        refs = list(refs)
        ids_ref, tokT_ref, valT_ref = refs[:3]
        refs = refs[3:]
        w_ref = refs.pop(0) if weighted else None
        if has_hot:
            hotC_ref, hotT_ref, hotLo_ref = refs[:3]
            refs = refs[3:]
            hotCLo_ref = refs.pop(0) if split_counts else None
        did_ref, out_ref, gmax_ref = refs
        ids = ids_ref[:]
        acc = _ell_accumulate(
            ids, tokT_ref, valT_ref, t_count, l_tile, out_ref.shape,
            w=None if w_ref is None else w_ref[:],
        )

        def epilogue(base):
            if has_hot:
                # split-precision hot matmul on the MXU: bf16 single-pass
                # products over high + residual parts reconstruct ~f32
                # accuracy — the same scheme as the XLA path
                # (models/sparse.py), now fused so the (Q, rows) base
                # never round-trips HBM.  With non-integer counts
                # (arbitrary query weights) the counts also carry a
                # residual part: three products instead of two.
                hc = hotC_ref[:]
                hi = hotT_ref[:]
                base = base + jnp.dot(hc, hi,
                                      preferred_element_type=jnp.float32)
                base = base + jnp.dot(hc, hotLo_ref[:],
                                      preferred_element_type=jnp.float32)
                if split_counts:
                    base = base + jnp.dot(hotCLo_ref[:], hi,
                                          preferred_element_type=jnp.float32)
            # pad-row mask (doc_ids < 0 -> -inf), fused with the base write
            base = jnp.where(did_ref[0, :][None, :] >= 0, base, NEG_INF)
            out_ref[:] = base
            # first tournament level: per-8-group maxima, so the top-k
            # tree skips its full read of the (Q, rows) base.  Emitted
            # transposed — a (TQ, BR/8) block would violate the (8, 128)
            # min-tile rule on the lane axis; (BR/8, TQ) tiles cleanly.
            # Mosaic cannot split the lane axis ((TQ, BR) -> (TQ, BR/8,
            # 8)); transpose first so the group split lands on sublanes
            tq, br = base.shape
            acc_t = base.T  # (BR, TQ)
            gmax_ref[:] = jnp.max(
                acc_t.reshape(br // GROUP, GROUP, tq), axis=1
            )

        if l_tiles == 1:
            epilogue(acc)
            return
        # slot-tiled wide bucket (VMEM legality for long documents):
        # partial sums accumulate in the revisited output block; the hot
        # matmul / mask / maxima epilogue runs once on the last tile
        li = pl.program_id(2)

        @pl.when(li == 0)
        def _init():
            out_ref[:] = acc

        @pl.when((li > 0) & (li < l_tiles - 1))
        def _add():
            out_ref[:] = out_ref[:] + acc

        @pl.when(li == l_tiles - 1)
        def _final():
            epilogue(out_ref[:] + acc)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def ell_score_fused(
    ids: jax.Array,  # (Q, T) int32, pads/OOV < 0
    tokT: jax.Array,  # (L_pad, rows) int32, PAD_TOK (-1) padded
    valT: jax.Array,  # (L_pad, rows) float32 (bf16 upcast transiently)
    doc_ids: jax.Array,  # (rows,) int32, -1 for pad rows
    hot_counts: jax.Array | None = None,  # (Q, H) bf16 per-query hot counts
    hotT: jax.Array | None = None,  # (H, rows) bf16 high part
    hotLo: jax.Array | None = None,  # (H, rows) bf16 residual
    weights: jax.Array | None = None,  # (Q, T) f32 per-token query weights
    hot_counts_lo: jax.Array | None = None,  # (Q, H) bf16 count residuals
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused bucket scoring: ELL scan + hot matmul + pad mask + group maxima.

    Returns ``(base, gmax)``: the masked (Q, rows) score base and its
    per-8-group maxima (Q, rows / 8).  Fusing the epilogue saves ~3 HBM
    round trips of the base per bucket (hot-add read+write, mask, and the
    selection tree's first max-reduce read) — measured ~8 ms of a 127 ms
    512-query step at the 512K-doc bench scale.

    The epilogue is the TPU analog of the reference's fused gather_reduce
    epilogues (``/root/reference/operations/gather_scatter.mojo:116-281``)
    and its stage-1 local top-k reduction (``topk.mojo:576-661``).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, t = ids.shape
    l_pad, rows = tokT.shape
    assert rows % BLOCK_ROWS == 0, rows
    if valT.dtype != jnp.float32:
        valT = valT.astype(jnp.float32)
    has_hot = hot_counts is not None
    weighted = weights is not None
    split_counts = hot_counts_lo is not None
    assert has_hot or not split_counts, "hot_counts_lo requires hot_counts"
    # legal query tilings here: tq == q_pad (single tile) or q_pad a
    # multiple of BLOCK_Q — anything else makes the TRANSPOSED gmax output
    # block (BR/GROUP, tq) violate Mosaic's last-dim rule (must be
    # 128-divisible or the full array dim).  Ragged chunks (e.g. q_pad=232
    # from a memory-budget cut) pad up to the next legal size; surfaced by
    # the 8.84M-doc run, invisible at the 512-query bench shape.
    q_pad = next_multiple(q, 8)
    if q_pad > BLOCK_Q and q_pad % BLOCK_Q:
        q_pad = next_multiple(q_pad, BLOCK_Q)
    tq = min(BLOCK_Q, q_pad)
    if q_pad != q:
        ids = jnp.pad(ids, ((0, q_pad - q), (0, 0)), constant_values=-1)
        if weighted:
            weights = jnp.pad(weights, ((0, q_pad - q), (0, 0)))
        if has_hot:
            hot_counts = jnp.pad(hot_counts, ((0, q_pad - q), (0, 0)))
            if split_counts:
                hot_counts_lo = jnp.pad(
                    hot_counts_lo, ((0, q_pad - q), (0, 0))
                )
    ids = jnp.where(ids >= 0, ids, -2)
    did2 = doc_ids.reshape(1, rows)

    l_tile, l_tiles = _slot_tiling(l_pad)
    if l_tiles > 1:
        lp = l_tiles * l_tile
        # pad slots: tok -1 never matches a query id (>= 0 or -2), val 0
        tokT = jnp.pad(tokT, ((0, lp - l_pad), (0, 0)), constant_values=-1)
        valT = jnp.pad(valT, ((0, lp - l_pad), (0, 0)))

    if l_tiles == 1:
        grid = (q_pad // tq, rows // BLOCK_ROWS)
        q_map = lambda qi, ri: (qi, 0)  # noqa: E731
        slot_map = lambda qi, ri: (0, ri)  # noqa: E731
        row_map = slot_map
        out_map = lambda qi, ri: (qi, ri)  # noqa: E731
        gmax_map = lambda qi, ri: (ri, qi)  # noqa: E731
    else:
        grid = (q_pad // tq, rows // BLOCK_ROWS, l_tiles)
        q_map = lambda qi, ri, li: (qi, 0)  # noqa: E731
        slot_map = lambda qi, ri, li: (li, ri)  # noqa: E731
        row_map = lambda qi, ri, li: (0, ri)  # noqa: E731
        out_map = lambda qi, ri, li: (qi, ri)  # noqa: E731
        gmax_map = lambda qi, ri, li: (ri, qi)  # noqa: E731
    q_spec = pl.BlockSpec((tq, t), q_map, memory_space=pltpu.VMEM)
    slot_spec = pl.BlockSpec((l_tile, BLOCK_ROWS), slot_map,
                             memory_space=pltpu.VMEM)
    in_specs = [q_spec, slot_spec, slot_spec]
    args = [ids, tokT, valT]
    if weighted:
        in_specs.append(q_spec)
        args.append(weights.astype(jnp.float32))
    if has_hot:
        h = hot_counts.shape[1]
        hc_spec = pl.BlockSpec((tq, h), q_map, memory_space=pltpu.VMEM)
        hrow_spec = pl.BlockSpec((h, BLOCK_ROWS), row_map,
                                 memory_space=pltpu.VMEM)
        in_specs += [hc_spec, hrow_spec, hrow_spec]
        args += [hot_counts, hotT, hotLo]
        if split_counts:
            in_specs.append(hc_spec)
            args.append(hot_counts_lo)
    in_specs.append(
        pl.BlockSpec((1, BLOCK_ROWS), row_map, memory_space=pltpu.VMEM)
    )
    args.append(did2)

    hot_bytes = 0
    if has_hot:
        hot_bytes = hotT.nbytes + hotLo.nbytes + hot_counts.nbytes
    base, gmax_t = pl.pallas_call(
        _fused_kernel_body(t, l_tile, has_hot, weighted, split_counts,
                           l_tiles=l_tiles),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tq, BLOCK_ROWS), out_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS // GROUP, tq), gmax_map,
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, rows), jnp.float32),
            jax.ShapeDtypeStruct((rows // GROUP, q_pad), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * rows * (l_pad * t + (
                2 * (hotT.shape[0] if has_hot else 0))),
            bytes_accessed=(tokT.nbytes + valT.nbytes) * (q_pad // tq)
            + hot_bytes + q_pad * rows * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return base[:q], gmax_t.T[:q]


def ell_score(ids, tokT, valT, implementation: str = "auto") -> jax.Array:
    """Dispatcher: pallas on TPU, interpreter elsewhere (same kernel)."""
    if implementation == "auto":
        implementation = "pallas"
    interpret = jax.devices()[0].platform != "tpu"
    if implementation == "pallas":
        return ell_score_pallas(ids, tokT, valT, interpret=interpret)
    if implementation == "lax":
        # reference path: scan over slots with a (Q, rows) carry
        ids = jnp.where(ids >= 0, ids, -2)

        def per_slot(acc, slot):
            tok_row, val_row = slot
            eq = ids[:, None, :] == tok_row[None, :, None]  # (Q, rows, T)
            return acc + jnp.sum(eq, -1).astype(jnp.float32) * val_row[None, :], None

        acc0 = jnp.zeros((ids.shape[0], tokT.shape[1]), jnp.float32)
        acc, _ = lax.scan(per_slot, acc0, (tokT, valT))
        return acc
    raise ValueError(f"unknown implementation {implementation!r}")

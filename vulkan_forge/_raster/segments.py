"""Segment-walk raster backend: the scalable path for dense meshes.

Grid meshes are row-major: triangle ids along one heightmap row are
contiguous, and the tris of a row that overlap a framebuffer tile COLUMN
form (conservatively) one contiguous id interval. The pipeline is:

  1. cull (back-face + zero-pixel-center) and COMPACT the surviving
     records into a dense stream, order-preserved (compact_valid);
  2. build tiny per-(mesh-row, tile-column) interval tables in compacted
     coordinates plus per-tile-row active mesh-row ranges (segment_bin):
       seg_lo/seg_hi : (NTX, ROWS)  compacted in-row interval
       row_base      : (ROWS,)      compacted stream offset of each row
       r_bounds      : (2, NTY)     active mesh-row range per tile row
  3. the kernel walks each tile's row intervals, streaming records
     CONTIGUOUSLY from HBM with double-buffered DMA.

Total binning work is O(T * NTX) vector min/max (no T x NT overlap matrix,
no gathers, no scatters, no per-scene capacity recompiles) -- the
TPU-native analog of a GPU binner's command stream.

Arbitrary (non-grid) geometry degenerates gracefully: row_size = T gives a
single row whose per-tile-column interval is plain interval binning (exact
for meshes whose ids correlate with screen x; conservative otherwise).

Output is byte-identical to the list-based backends: same records, same
coverage/interp math, same max-id painter rule (looser intervals only add
triangles whose bboxes cannot cover the tile, and bbox >= coverage).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .setup import REC_WIDTH, TILE_H, TILE_W

_CHUNK = 8      # triangles per vector op (sublane width)
SEG_BLK = 64    # record rows per DMA block (64 x 32 x 4B = 8 KB)


class SegmentBinning(NamedTuple):
    seg_lo: jnp.ndarray    # (NTX, ROWS) int32 (compacted in-row coords)
    seg_hi: jnp.ndarray    # (NTX, ROWS) int32
    row_base: jnp.ndarray  # (ROWS,) int32: compacted stream offset per row
    r_bounds: jnp.ndarray  # (2, NTY) int32: [r_lo; r_hi] inclusive
    counts_est: jnp.ndarray  # (NTY*NTX,) int32 upper-bound work estimate


ID_COL = 32     # record column carrying the ORIGINAL triangle id (as f32)
ID_HI_COL = 33  # id >> 12 as f32 (exact painter compare for T >= 2^24)
ID_LO_COL = 34  # id & 4095 as f32
# (cols 25..30 carry the near/far clip functionals -- setup.py record layout)


def compact_valid(records, bbox, cap: int, ids=None):
    """Row-gather the valid-triangle records into a dense stream.

    Typically only a small fraction of a dense mesh's triangles survive
    back-face + zero-pixel-center culling (e.g. ~10% for a 1024-grid at
    800x600); compaction removes the 90% dead weight from the segment walk.
    ``cap`` is the static capacity (host-rounded from the valid count).

    ``bbox`` may be a PERMUTED view of the triangle stream (e.g. the
    column-major walk order); ``ids`` then maps stream position -> original
    triangle id, and the gather pulls each permuted position's record from
    its ORIGINAL row so geometry and painter id always agree. The original
    draw-order id is written into ID_COL (f32-exact for T < 2^24) and split
    into (ID_HI_COL, ID_LO_COL) for the exact compare used above that.
    Returns (crecords (cap+1, REC_WIDTH), src_idx (cap,)).
    """
    T = bbox.shape[0]
    valid = bbox[:, 1] >= bbox[:, 0]
    src = jnp.nonzero(valid, size=cap, fill_value=T)[0].astype(jnp.int32)
    if ids is None:
        orig = src  # fill positions gather the sentinel row T (never covers)
    else:
        orig = jnp.concatenate(
            [ids.astype(jnp.int32), jnp.full((1,), T, jnp.int32)])[src]
    crecords = records[orig]                      # fast row gather
    orig_f = orig.astype(jnp.float32)
    crecords = crecords.at[:, ID_COL].set(orig_f)
    crecords = crecords.at[:, ID_HI_COL].set((orig >> 12).astype(jnp.float32))
    crecords = crecords.at[:, ID_LO_COL].set((orig & 4095).astype(jnp.float32))
    sentinel = jnp.zeros((1, records.shape[1]), records.dtype)
    return jnp.concatenate([crecords, sentinel], axis=0), src


def segment_bin(bbox, width: int, height: int, row_size: int,
                tile_h: int = TILE_H, tile_w: int = TILE_W) -> SegmentBinning:
    """Build per-(mesh-row, tile-column) intervals in COMPACTED coordinates.

    Intervals index into the compact_valid() stream: within each mesh row,
    a triangle's compacted position is its rank among the row's valid
    triangles, and row_base is the running offset of the row's first valid
    triangle. Culled triangles vanish from both the tables and the walk.
    """
    T = bbox.shape[0]
    nty = -(-height // tile_h)
    ntx = -(-width // tile_w)
    rows = -(-T // row_size)
    pad = rows * row_size - T

    tx0 = bbox[:, 0] // tile_w
    tx1 = bbox[:, 1] // tile_w
    ty0 = bbox[:, 2] // tile_h
    ty1 = bbox[:, 3] // tile_h
    valid = bbox[:, 1] >= bbox[:, 0]
    if pad:
        big = jnp.full((pad,), 1 << 20, jnp.int32)
        neg = jnp.full((pad,), -(1 << 20), jnp.int32)
        tx0 = jnp.concatenate([tx0, big])
        tx1 = jnp.concatenate([tx1, neg])
        ty0 = jnp.concatenate([ty0, big])
        ty1 = jnp.concatenate([ty1, neg])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])

    tx0r = tx0.reshape(rows, row_size)
    tx1r = tx1.reshape(rows, row_size)
    ty0r = ty0.reshape(rows, row_size)
    ty1r = ty1.reshape(rows, row_size)
    validr = valid.reshape(rows, row_size)

    # Compacted coordinates: rank of each valid tri within its row, and the
    # running per-row base offset in the compacted stream.
    rank = jnp.cumsum(validr.astype(jnp.int32), axis=1) - 1  # (ROWS, row_size)
    row_counts = jnp.sum(validr.astype(jnp.int32), axis=1)   # (ROWS,)
    row_base = (jnp.cumsum(row_counts) - row_counts).astype(jnp.int32)

    los = []
    his = []
    for tx in range(ntx):
        ov = (tx0r <= tx) & (tx <= tx1r) & validr
        los.append(jnp.min(jnp.where(ov, rank, 1 << 28), axis=1))
        his.append(jnp.max(jnp.where(ov, rank, -1), axis=1))
    seg_lo = jnp.stack(los, axis=0).astype(jnp.int32)   # (NTX, ROWS)
    seg_hi = jnp.stack(his, axis=0).astype(jnp.int32)

    row_ty0 = jnp.min(jnp.where(validr, ty0r, 1 << 20), axis=1)  # (ROWS,)
    row_ty1 = jnp.max(jnp.where(validr, ty1r, -(1 << 20)), axis=1)
    tys = jnp.arange(nty, dtype=jnp.int32)[None, :]
    row_act = ((row_ty0[:, None] <= tys) & (tys <= row_ty1[:, None]))  # (ROWS,NTY)

    ridx = jnp.arange(rows, dtype=jnp.int32)[:, None]
    r_lo = jnp.min(jnp.where(row_act, ridx, rows), axis=0)
    r_hi = jnp.max(jnp.where(row_act, ridx, -1), axis=0)
    r_bounds = jnp.stack([r_lo, r_hi]).astype(jnp.int32)  # (2, NTY)

    seg_len = jnp.maximum(seg_hi - seg_lo + 1, 0).astype(jnp.float32)  # (NTX,ROWS)
    counts = jnp.einsum("ry,xr->yx", row_act.astype(jnp.float32), seg_len,
                        preferred_element_type=jnp.float32)
    return SegmentBinning(seg_lo, seg_hi, row_base, r_bounds,
                          counts.astype(jnp.int32).reshape(-1))


def _seg_kernel(r_bounds_ref,                       # scalar prefetch (B,2,NTY)
                seglo_ref, seghi_ref, rowbase_ref,  # VMEM tables (1,1,ROWS,1)
                recs_ref,                           # records in HBM
                v0_ref, v1_ref, v2_ref, mask_ref,   # outputs
                scratch, sem,                       # (2, SEG_BLK, 128), DMA sems
                *, tile_h, tile_w, nty, frame_stride, exact_ids=False):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    frame = ty // nty
    ty_local = jax.lax.rem(ty, nty)

    R, L = tile_h, tile_w
    px = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2).astype(jnp.float32)
          + (tx * tile_w).astype(jnp.float32) + 0.5)
    py = (jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0).astype(jnp.float32)
          + (ty_local * tile_h).astype(jnp.float32) + 0.5)

    lane_ids = jax.lax.broadcasted_iota(
        jnp.int32, (1, _CHUNK, 1), 1)                 # sublane = tri in chunk

    zero = jnp.zeros((R, _CHUNK, L), jnp.float32)
    neg1 = jnp.full((R, _CHUNK, L), -1.0, jnp.float32)
    # Painter-id accumulator: one f32 id (exact < 2^24), or a lexicographic
    # (id>>12, id&4095) pair when T can exceed 2^24 (e.g. grid=4096 meshes).
    id_init = (neg1, neg1) if exact_ids else (neg1,)
    init_state = id_init + (zero, zero, zero,
                            jnp.ones((R, _CHUNK, L), jnp.float32))

    r0 = r_bounds_ref[frame, 0, ty_local]
    r1 = r_bounds_ref[frame, 1, ty_local]

    def seg_params(r):
        """Absolute compacted-stream interval for (row r, this tile column),
        start aligned DOWN to the physical (8,128) tile rows (an unaligned
        DMA fragments into per-row transfers). Extra leading triangles are
        either same-row predecessors whose bboxes miss this tile column
        (coverage rejects) or the previous row's tail (idempotent under the
        max-id painter rule)."""
        lo_raw = seglo_ref[0, 0, r, 0]
        hi = seghi_ref[0, 0, r, 0]
        rb = rowbase_ref[0, 0, r, 0]
        base = ((rb + lo_raw) // 8) * 8
        n = jnp.where(hi < lo_raw, 0, rb + hi - base + 1)
        return base, n

    def start_dma(base, b, slot):
        start = frame * frame_stride + base + b * SEG_BLK
        return pltpu.make_async_copy(
            recs_ref.at[pl.ds(start, SEG_BLK), :],
            scratch.at[slot], sem.at[slot])  # (SEG_BLK, 128) slab

    def row_body(r, carry):
        state, slot, pending = carry
        base, n = seg_params(r)
        # Empty rows yield a zero-trip block loop (no branch: lax.cond with
        # large vector carries copies state on both arms).
        nblk = jnp.maximum((n + SEG_BLK - 1) // SEG_BLK, 0)

        # Block 0 is either already in flight (cross-row prefetch from the
        # previous iteration) or started now.
        @pl.when((nblk > 0) & jnp.logical_not(pending))
        def _():
            start_dma(base, 0, slot).start()

        # Cross-row prefetch: while computing this row, fetch the NEXT
        # row's first block into the other buffer. Only in the common
        # single-block case -- multi-block rows own both buffers.
        nxt = jnp.minimum(r + 1, r1)
        base1, n1 = seg_params(nxt)
        can_prefetch = (nblk == 1) & (r < r1) & (n1 > 0)

        @pl.when(can_prefetch)
        def _():
            start_dma(base1, 0, 1 - slot).start()

        if True:
            def blk_body(b, c2):
                state, slot = c2
                # Within-row double buffering (multi-block rows only).
                @pl.when((b + 1 < nblk) & jnp.logical_not(can_prefetch))
                def _():
                    start_dma(base, b + 1, 1 - slot).start()
                start_dma(base, b, slot).wait()
                remaining = n - b * SEG_BLK
                nch = jnp.minimum((remaining + _CHUNK - 1) // _CHUNK,
                                  SEG_BLK // _CHUNK)

                def chunk(ci, st):
                    id_acc, a0s, a1s, a2s, aws = st[:-4], st[-4], st[-3], st[-2], st[-1]
                    rec = scratch[slot, pl.ds(ci * _CHUNK, _CHUNK), :]

                    def col(k):
                        return rec[:, k].reshape(1, _CHUNK, 1)

                    f0 = col(2) * (px - col(0)) - col(3) * (py - col(1))
                    f1 = col(6) * (px - col(4)) - col(7) * (py - col(5))
                    f2 = col(10) * (px - col(8)) - col(11) * (py - col(9))
                    # in-row local index of each sublane's triangle
                    local = (b * SEG_BLK + ci * _CHUNK) + lane_ids
                    inseg = local < n
                    a0 = f0 * col(12) + f1 * col(13) + f2 * col(14)
                    a1 = f0 * col(15) + f1 * col(16) + f2 * col(17)
                    a2 = f0 * col(18) + f1 * col(19) + f2 * col(20)
                    aw = f0 * col(21) + f1 * col(22) + f2 * col(23)
                    # Clip-volume tests (setup.py "Near-plane clipping").
                    az = f0 * col(25) + f1 * col(26) + f2 * col(27)
                    asum = f0 * col(28) + f1 * col(29) + f2 * col(30)
                    cov = ((f0 >= 0.0) & (f1 >= 0.0) & (f2 >= 0.0)
                           & (col(24) > 0.0) & inseg
                           & (az >= 0.0) & (aw > 0.0) & (asum - az >= 0.0))
                    # ORIGINAL draw-order id from the record: max-id merge
                    # makes the walk order-independent, so a permuted
                    # (column-major) stream still paints exactly.
                    if exact_ids:
                        acc_hi, acc_lo = id_acc
                        hi = col(ID_HI_COL) * jnp.ones_like(f0)
                        lo = col(ID_LO_COL) * jnp.ones_like(f0)
                        better = cov & ((hi > acc_hi)
                                        | ((hi == acc_hi) & (lo > acc_lo)))
                        new_id = (jnp.where(better, hi, acc_hi),
                                  jnp.where(better, lo, acc_lo))
                    else:
                        (acc_id,) = id_acc
                        ids = col(ID_COL) * jnp.ones_like(f0)
                        better = cov & (ids > acc_id)
                        new_id = (jnp.where(better, ids, acc_id),)
                    return new_id + (jnp.where(better, a0, a0s),
                                     jnp.where(better, a1, a1s),
                                     jnp.where(better, a2, a2s),
                                     jnp.where(better, aw, aws))

                state = jax.lax.fori_loop(0, nch, chunk, state)
                return (state, 1 - slot)

            state, slot = jax.lax.fori_loop(0, nblk, blk_body, (state, slot))
            # A single-block row that prefetched leaves the next row's block
            # 0 in flight in the buffer `slot` now points at.
            return (state, slot, can_prefetch)

    state, _, _ = jax.lax.fori_loop(
        r0, r1 + 1, row_body, (init_state, 0, jnp.bool_(False)))
    acc0, acc1, acc2, accw = state[-4], state[-3], state[-2], state[-1]

    if exact_ids:
        acc_hi, acc_lo = state[0], state[1]
        whi = jnp.max(acc_hi, axis=1, keepdims=True)
        cand = acc_hi == whi
        wlo = jnp.max(jnp.where(cand, acc_lo, -1.0), axis=1, keepdims=True)
        sel = (cand & (acc_lo == wlo)).astype(jnp.float32)
        covered = whi[:, 0, :] >= 0.0
    else:
        acc_id = state[0]
        winner = jnp.max(acc_id, axis=1, keepdims=True)
        sel = (acc_id == winner).astype(jnp.float32)
        covered = winner[:, 0, :] >= 0.0
    norm = 1.0 / jnp.sum(sel, axis=1)
    a0 = jnp.sum(acc0 * sel, axis=1) * norm
    a1 = jnp.sum(acc1 * sel, axis=1) * norm
    a2 = jnp.sum(acc2 * sel, axis=1) * norm
    aw = jnp.sum(accw * sel, axis=1) * norm

    rcp = 1.0 / jnp.where(jnp.abs(aw) < 1e-20, 1.0, aw)
    v0_ref[...] = a0 * rcp
    v1_ref[...] = a1 * rcp
    v2_ref[...] = a2 * rcp
    mask_ref[...] = covered.astype(jnp.float32)


def render_gbuffer_segments(records, binning: SegmentBinning,
                            width: int, height: int,
                            tile_h: int = TILE_H, tile_w: int = TILE_W,
                            exact_ids: bool = False):
    """Single-frame segment-walk raster over COMPACTED records."""
    v0, v1, v2, m = render_gbuffer_segments_batch(
        records[None], jax.tree.map(lambda a: a[None], binning),
        width, height, tile_h, tile_w, exact_ids=exact_ids)
    return v0[0], v1[0], v2[0], m[0]


def render_gbuffer_segments_batch(records_b, binning_b: SegmentBinning,
                                  width: int, height: int,
                                  tile_h: int = TILE_H, tile_w: int = TILE_W,
                                  exact_ids: bool = False):
    """B frames in one pallas_call (frame axis folded into the tile grid).

    records_b: (B, CAP+1, REC_WIDTH) COMPACTED records (compact_valid);
    binning fields carry a leading B axis. Returns 4 x (B, H, W).
    ``exact_ids``: use the (hi, lo) split painter compare -- required when
    original triangle ids can reach 2^24 (adjacent f32 ids collide there).
    """
    B, trec, _ = records_b.shape
    nty = -(-height // tile_h)
    ntx = -(-width // tile_w)
    rows = binning_b.seg_lo.shape[2]

    # Per-frame stride must stay a multiple of 8 rows: the kernel aligns DMA
    # starts down to 8-row boundaries WITHIN a frame, so an unaligned stride
    # would fragment every frame>0 DMA into per-row transfers.
    trec_pad = -(-trec // 8) * 8
    if trec_pad != trec:
        records_b = jnp.pad(records_b, ((0, 0), (0, trec_pad - trec), (0, 0)))
        trec = trec_pad

    # Pad the flattened record stream (a) to 128 lanes so DMA slabs match
    # XLA's physical (8,128) tiling without lane slicing, and (b) by SEG_BLK
    # rows so a DMA starting at the last row cannot run off the end.
    records_flat = records_b.reshape(B * trec, REC_WIDTH)
    records_flat = jnp.pad(records_flat,
                           ((0, SEG_BLK), (0, 128 - REC_WIDTH)))

    out_shape = jax.ShapeDtypeStruct((B * nty * tile_h, ntx * tile_w),
                                     jnp.float32)
    kernel = functools.partial(_seg_kernel, tile_h=tile_h, tile_w=tile_w,
                               nty=nty, frame_stride=trec,
                               exact_ids=exact_ids)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * nty, ntx),
        in_specs=[
            pl.BlockSpec((1, 1, rows, 1),
                         lambda ty, tx, *p: (ty // nty, tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, 1),
                         lambda ty, tx, *p: (ty // nty, tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, 1),
                         lambda ty, tx, *p: (ty // nty, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # records (flat, HBM)
        ],
        out_specs=tuple(
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx, *p: (ty, tx),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((2, SEG_BLK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    seg_lo4 = binning_b.seg_lo[..., None]   # (B, NTX, ROWS, 1)
    seg_hi4 = binning_b.seg_hi[..., None]
    row_base4 = binning_b.row_base[:, None, :, None]  # (B, 1, ROWS, 1)
    v0, v1, v2, mask = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape, out_shape, out_shape),
    )(binning_b.r_bounds, seg_lo4, seg_hi4, row_base4, records_flat)

    def crop(a):
        return a.reshape(B, nty * tile_h, ntx * tile_w)[:, :height, :width]

    return crop(v0), crop(v1), crop(v2), crop(mask) > 0.5
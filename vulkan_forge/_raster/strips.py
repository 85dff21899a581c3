"""Strip-walk raster backend: condition-free column-strip kernel.

The round-2 successor to ``segments.py`` for dense meshes, rebuilt around
measured Mosaic cost facts (one ``lax.cond``/``pl.when`` in a hot loop costs
~6.7 us; condition-free loops with dynamic-offset VMEM read-modify-writes,
VMEM scalar reads and always-issued DMAs all run at ~20-40 ns/iteration):

  - ONE program per (frame, tile-column): the program owns a full-height
    (H, 128) accumulator strip in VMEM, so each (mesh-row, column) interval
    is walked ONCE -- the old kernel re-walked every interval for every tile
    row a mesh row touched (25-50x slop for tilted views).
  - Records are streamed in DRAW ORDER straight from HBM (8-triangle blocks,
    4-deep DMA ring, one block per loop iteration): no per-frame compaction
    gather (row gathers measured at ~10 GB/s -- 20-50 ms for dense scenes),
    no valid-count host sync, no capacity-bucket recompiles. Invalid blocks
    cost one ~25 ns zero-trip iteration (their trip count is 0).
  - Painter ids are recomputed in-kernel from the block index (draw order is
    the stream order), so no id columns ride the stream; the exact split-id
    compare engages statically for T >= 2^24.
  - Per-block tile-row span (ty0, n_trips) is precomputed on the XLA side
    into spare record columns of each block's lane-0 row: the kernel reads
    them as static-offset scalars -- zero per-block table lookups.

Byte-identical to the jnp oracle (tiles.py): same edge functions, same
interpolation formulas, same max-id painter rule; the in-chunk one-hot
winner select sums exactly one term, so values are bit-exact.

Parity anchors: rasterization rules pinned by src/terrain/pipeline.rs
(CCW+back-cull, no depth), painter order src/terrain/pipeline.rs:133.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .setup import REC_WIDTH, TILE_H, TILE_W

TY0_COL = 35     # block tile-row start (lane-0 row of each block)
NTRIP_COL = 36   # block tile-row trip count (lane-0 row of each block)
_RING = 2        # DMA ring depth (slabs in flight)
_SLAB = 8        # 8-triangle blocks per DMA slab (64 rows = 32 KB)


class StripTables(NamedTuple):
    stream: jnp.ndarray    # (TB*8 [+B axis flattened], REC_WIDTH) padded recs
    wl_start: jnp.ndarray  # (B, NTX, ROWS) int32 absolute block index
    wl_n: jnp.ndarray      # (B, NTX, ROWS) int32 blocks in the interval
    counts: jnp.ndarray    # (B, NTX) int32 worklist entries per column


def build_strip_stream(records, bbox, row_size: int,
                       width: int, height: int,
                       tile_h: int = TILE_H, tile_w: int = TILE_W):
    """Per-frame XLA prep: pad rows to 8-triangle blocks, stamp per-block
    tile-row metadata into spare record columns, and build the per-column
    worklists of (mesh-row, column) block intervals.

    records: (T+1, REC_WIDTH) draw-order triangle records (triangle_setup).
    bbox: (T, 4) pixel bboxes (invalid encoding from triangle_setup).
    Returns (stream (TB*8, REC_WIDTH), wl_start (NTX, ROWS), wl_n, counts).
    """
    T = bbox.shape[0]
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    rows = -(-T // row_size)
    bpr = -(-row_size // 8)          # blocks per mesh row (row-padded)
    tb = rows * bpr

    # --- per-triangle tile coords, padded to (rows, bpr*8)
    tx0 = bbox[:, 0] // tile_w
    tx1 = bbox[:, 1] // tile_w
    ty0 = bbox[:, 2] // tile_h
    ty1 = bbox[:, 3] // tile_h
    valid = bbox[:, 1] >= bbox[:, 0]

    def rowpad(a, fill):
        a = jnp.concatenate(
            [a, jnp.full((rows * row_size - T,), fill, a.dtype)])
        a = a.reshape(rows, row_size)
        return jnp.pad(a, ((0, 0), (0, bpr * 8 - row_size)),
                       constant_values=fill)

    big = jnp.int32(1 << 20)
    tx0b = rowpad(tx0, big).reshape(tb, 8)
    tx1b = rowpad(tx1, -big).reshape(tb, 8)
    ty0b = rowpad(ty0, big).reshape(tb, 8)
    ty1b = rowpad(ty1, -big).reshape(tb, 8)
    validb = rowpad(valid.astype(jnp.int32), 0).reshape(tb, 8) > 0

    # --- per-block unions (invalid tris excluded)
    blk_tx0 = jnp.min(jnp.where(validb, tx0b, big), axis=1)   # (TB,)
    blk_tx1 = jnp.max(jnp.where(validb, tx1b, -big), axis=1)
    blk_ty0 = jnp.min(jnp.where(validb, ty0b, big), axis=1)
    blk_ty1 = jnp.max(jnp.where(validb, ty1b, -big), axis=1)
    blk_ty0c = jnp.clip(blk_ty0, 0, nty - 1)
    blk_trips = jnp.clip(blk_ty1, 0, nty - 1) - blk_ty0c + 1
    blk_trips = jnp.where(jnp.any(validb, axis=1),
                          jnp.maximum(blk_trips, 0), 0)        # invalid: 0

    # --- padded record stream with metadata stamped on lane-0 rows
    rec_rows = records[:T]
    pad_rows = rows * bpr * 8 - T
    rec_pad = jnp.concatenate(
        [rec_rows.reshape(rows, row_size, REC_WIDTH),
         jnp.zeros((rows, bpr * 8 - row_size, REC_WIDTH), records.dtype)],
        axis=1) if bpr * 8 != row_size else rec_rows.reshape(
            rows, row_size, REC_WIDTH)
    del pad_rows
    # Pad FIRST (block count to whole DMA slabs so clamped slab reads never
    # cross into the next frame's stream, and lanes to 128 so DMAs match
    # the physical (8,128) tiling), THEN stamp: stamping before padding
    # forces XLA to materialize the 1.07-GB-scale stream TWICE (a full
    # copy for the scatter update and another for the pad); this order is
    # one pad pass plus two tiny (TB,)-element scatters. Byte-identical:
    # the stamps land on the same cells either way.
    tb_pad = max(-(-tb // _SLAB) * _SLAB, _SLAB)
    stream = rec_pad.reshape(tb * 8, REC_WIDTH)
    stream = jnp.pad(stream, ((0, (tb_pad - tb) * 8), (0, 128 - REC_WIDTH)))
    stream = stream.reshape(tb_pad, 8, 128)
    stream = stream.at[:tb, 0, TY0_COL].set(blk_ty0c.astype(jnp.float32))
    stream = stream.at[:tb, 0, NTRIP_COL].set(blk_trips.astype(jnp.float32))
    stream = stream.reshape(tb_pad * 8, 128)

    # --- per (column, mesh-row) block intervals (conservative: min..max
    # overlapping block index; coverage rejects extras, painter max-id keeps
    # the walk order-independent)
    bidx = jnp.arange(bpr, dtype=jnp.int32)[None, :]
    t0r = blk_tx0.reshape(rows, bpr)
    t1r = blk_tx1.reshape(rows, bpr)
    starts = []
    lens = []
    for tx in range(ntx):
        ov = (t0r <= tx) & (tx <= t1r)
        blo = jnp.min(jnp.where(ov, bidx, bpr), axis=1)        # (ROWS,)
        bhi = jnp.max(jnp.where(ov, bidx, -1), axis=1)
        starts.append(jnp.arange(rows, dtype=jnp.int32) * bpr + blo)
        lens.append(jnp.maximum(bhi - blo + 1, 0))
    start_rc = jnp.stack(starts)                               # (NTX, ROWS)
    n_rc = jnp.stack(lens).astype(jnp.int32)

    # --- compact nonempty rows to the head of each column's worklist
    nonempty = n_rc > 0
    order = jnp.argsort(~nonempty, axis=1, stable=True)        # rows kept
    wl_start = jnp.take_along_axis(start_rc, order, axis=1)
    wl_n = jnp.take_along_axis(n_rc, order, axis=1)
    counts = jnp.sum(nonempty.astype(jnp.int32), axis=1)       # (NTX,)
    return stream, wl_start, wl_n, counts


def _strip_kernel(counts_ref,                       # SMEM prefetch (B*NTX,)
                  wls_ref, wln_ref,                 # VMEM (1,1,ROWS)
                  stream_ref,                       # HBM records
                  v0_ref, v1_ref, v2_ref, mask_ref, # outputs (H8, 128)
                  aid_ref, ahi_ref, a0_ref, a1_ref, a2_ref, aw_ref,
                  scratch, sem,                     # (RING, 8, REC) + sems
                  *, ntx, rows, bpr, row_size, frame_blocks,
                  exact_ids, fill_rule="inclusive"):
    prog = pl.program_id(0)                          # b * ntx + tx
    tx = jax.lax.rem(prog, ntx)
    frame = jax.lax.div(prog, ntx)
    h8 = v0_ref.shape[0]

    # init accumulators
    neg1 = jnp.full((h8, 128), -1.0, jnp.float32)
    zero = jnp.zeros((h8, 128), jnp.float32)
    aid_ref[...] = neg1
    if exact_ids:
        ahi_ref[...] = neg1
    a0_ref[...] = zero
    a1_ref[...] = zero
    a2_ref[...] = zero
    aw_ref[...] = jnp.ones((h8, 128), jnp.float32)

    px = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
          .astype(jnp.float32) + (tx * 128).astype(jnp.float32) + 0.5)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)

    frame_base = frame * frame_blocks
    max_slab = frame_blocks - _SLAB  # last legal slab start (frame-local)

    def dma(slab_blk, slot):
        # One slab = _SLAB consecutive 8-triangle blocks. Starts are clamped
        # to the frame, so slabs may re-read earlier blocks past an entry's
        # end -- harmless: re-evaluating any triangle anywhere is idempotent
        # under the max-id painter rule, and coverage is exact (bbox is not
        # part of the coverage test).
        return pltpu.make_async_copy(
            stream_ref.at[pl.ds((frame_base + slab_blk) * 8, _SLAB * 8), :],
            scratch.at[slot], sem.at[slot])

    n_entries = counts_ref[prog]

    def entry_body(e, carry):
        start = wls_ref[0, 0, e, 0]
        n = wln_ref[0, 0, e, 0]
        nslab = jax.lax.div(n + _SLAB - 1, _SLAB)

        def slab_start(s):
            return jnp.minimum(start + s * _SLAB, max_slab)

        # prime the ring (duplicate clamped starts are harmless; sem counts
        # pair with the drain below)
        for k in range(_RING):
            dma(slab_start(jnp.int32(k)), k).start()

        def slab_body(s, carry2):
            slot = jax.lax.rem(s, _RING)
            dma(slab_start(s), slot).wait()
            base_blk = slab_start(s)
            for c in range(_SLAB):
                _do_block(scratch, slot, c, base_blk + c)
            dma(slab_start(s + _RING), slot).start()
            return carry2

        def _do_block(scratch, slot, c, blk):
            rec = scratch[slot, pl.ds(c * 8, 8), :]  # (8, 128) static slice

            # Hoist every record-column broadcast out of the trip loop: a
            # trip re-sliced 27 columns per tile row, and Mosaic does not
            # reliably CSE dynamic-ref reads across fori iterations (the
            # measured ~2.6x gap between the visit cost and its op-count
            # floor, docs/NEXT.md). Pure scheduling: byte-identical.
            ncols = 34 if fill_rule == "hw" else 31
            C = [rec[:, k].reshape(1, 8, 1) for k in range(ncols)]

            def col(k):
                return C[k]

            ty0 = rec[0, TY0_COL].astype(jnp.int32)
            ntr = rec[0, NTRIP_COL].astype(jnp.int32)

            r = jax.lax.div(blk, bpr)
            id0 = r * row_size + (blk - r * bpr) * 8
            ids_i = id0 + lane_ids                   # (1,8,1) int32
            if exact_ids:
                id_hi = (ids_i >> 12).astype(jnp.float32)
                id_lo = (ids_i & 4095).astype(jnp.float32)
            else:
                ids_f = ids_i.astype(jnp.float32)

            def trip(t, carry3):
                ty = ty0 + t
                py = (jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0)
                      .astype(jnp.float32)
                      + (ty * 8).astype(jnp.float32) + 0.5)
                f0 = col(2) * (px - col(0)) - col(3) * (py - col(1))
                f1 = col(6) * (px - col(4)) - col(7) * (py - col(5))
                f2 = col(10) * (px - col(8)) - col(11) * (py - col(9))
                a0 = f0 * col(12) + f1 * col(13) + f2 * col(14)
                a1 = f0 * col(15) + f1 * col(16) + f2 * col(17)
                a2 = f0 * col(18) + f1 * col(19) + f2 * col(20)
                aw = f0 * col(21) + f1 * col(22) + f2 * col(23)
                # Clip-volume tests (setup.py "Near-plane clipping").
                az = f0 * col(25) + f1 * col(26) + f2 * col(27)
                asum = f0 * col(28) + f1 * col(29) + f2 * col(30)
                if fill_rule == "hw":
                    edges = ((f0 >= col(31)) & (f1 >= col(32))
                             & (f2 >= col(33)))
                else:
                    edges = (f0 >= 0.0) & (f1 >= 0.0) & (f2 >= 0.0)
                cov = (edges & (col(24) > 0.0)
                       & (az >= 0.0) & (aw > 0.0) & (asum - az >= 0.0))

                sl = pl.ds(ty * 8, 8)
                if exact_ids:
                    chi = jnp.where(cov, id_hi * jnp.ones_like(f0), -1.0)
                    clo = jnp.where(cov, id_lo * jnp.ones_like(f0), -1.0)
                    whi = jnp.max(chi, axis=1, keepdims=True)
                    cand = (chi == whi) & cov
                    wlo = jnp.max(jnp.where(cand, clo, -1.0), axis=1,
                                  keepdims=True)
                    sel = (cand & (clo == wlo)).astype(jnp.float32)
                    cid_hi = whi[:, 0, :]
                    cid = wlo[:, 0, :]
                    acc_hi = ahi_ref[sl, :]
                    acc_lo = aid_ref[sl, :]
                    better = ((cid_hi > acc_hi)
                              | ((cid_hi == acc_hi) & (cid > acc_lo)))
                    ahi_ref[sl, :] = jnp.where(better, cid_hi, acc_hi)
                else:
                    cids = jnp.where(cov, ids_f * jnp.ones_like(f0), -1.0)
                    wid = jnp.max(cids, axis=1, keepdims=True)
                    sel = ((cids == wid) & cov).astype(jnp.float32)
                    cid = wid[:, 0, :]
                    acc_lo = aid_ref[sl, :]
                    better = cid > acc_lo
                # one-hot select: exactly one term (ids unique), bit-exact
                c0 = jnp.sum(a0 * sel, axis=1)
                c1 = jnp.sum(a1 * sel, axis=1)
                c2 = jnp.sum(a2 * sel, axis=1)
                cw = jnp.sum(aw * sel, axis=1)
                aid_ref[sl, :] = jnp.where(better, cid, acc_lo)
                a0_ref[sl, :] = jnp.where(better, c0, a0_ref[sl, :])
                a1_ref[sl, :] = jnp.where(better, c1, a1_ref[sl, :])
                a2_ref[sl, :] = jnp.where(better, c2, a2_ref[sl, :])
                aw_ref[sl, :] = jnp.where(better, cw, aw_ref[sl, :])
                return carry3

            jax.lax.fori_loop(0, ntr, trip, 0)

        jax.lax.fori_loop(0, nslab, slab_body, 0)
        # drain the ring (RING outstanding starts per entry)
        for k in range(_RING):
            dma(slab_start(jnp.int32(k)), k).wait()
        return carry

    jax.lax.fori_loop(0, n_entries, entry_body, 0)

    # epilogue: perspective divide + mask (same formulas as tiles.py)
    if exact_ids:
        covered = ahi_ref[...] >= 0.0
    else:
        covered = aid_ref[...] >= 0.0
    aw = aw_ref[...]
    rcp = 1.0 / jnp.where(jnp.abs(aw) < 1e-20, 1.0, aw)
    v0_ref[...] = a0_ref[...] * rcp
    v1_ref[...] = a1_ref[...] * rcp
    v2_ref[...] = a2_ref[...] * rcp
    mask_ref[...] = covered.astype(jnp.float32)


def render_gbuffer_strips(records, bbox, row_size: int,
                          width: int, height: int,
                          tile_h: int = TILE_H, tile_w: int = TILE_W,
                          fill_rule: str = "inclusive"):
    """Single-frame strip-walk raster straight from draw-order records."""
    v0, v1, v2, m = render_gbuffer_strips_batch(
        records[None], bbox[None], row_size, width, height, tile_h, tile_w,
        fill_rule=fill_rule)
    return v0[0], v1[0], v2[0], m[0]


def render_gbuffer_strips_batch(records_b, bbox_b, row_size: int,
                                width: int, height: int,
                                tile_h: int = TILE_H, tile_w: int = TILE_W,
                                fill_rule: str = "inclusive"):
    """B frames in one pallas_call, grid (B*NTX,).

    records_b: (B, T+1, REC_WIDTH) draw-order records; bbox_b: (B, T, 4).
    Returns (v0, v1, v2, mask), each (B, H, W). No data-dependent shapes:
    one compile per (B, T, W, H, row_size).
    """
    B, _, _ = records_b.shape
    T = bbox_b.shape[1]
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    rows = -(-T // row_size)
    bpr = -(-row_size // 8)
    tb = rows * bpr
    h8 = nty * tile_h
    assert tile_h == 8 and tile_w == 128, "strip kernel is (8,128)-native"
    # Five f32 accumulator strips must fit VMEM alongside outputs.
    assert h8 * 128 * 4 * 6 < 12 * 2**20, "framebuffer too tall for strips"

    prep = jax.vmap(functools.partial(
        build_strip_stream, row_size=row_size, width=width, height=height,
        tile_h=tile_h, tile_w=tile_w))
    stream_b, wls_b, wln_b, counts_b = prep(records_b, bbox_b)
    tb_pad = max(-(-tb // _SLAB) * _SLAB, _SLAB)   # matches build pad
    stream = stream_b.reshape(B * tb_pad * 8, 128)

    exact_ids = T >= (1 << 24)
    kernel = functools.partial(
        _strip_kernel, ntx=ntx, rows=rows, bpr=bpr, row_size=row_size,
        frame_blocks=tb_pad, exact_ids=exact_ids, fill_rule=fill_rule)

    out_shape = jax.ShapeDtypeStruct((B * h8, ntx * 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * ntx,),
        in_specs=[
            pl.BlockSpec((1, 1, rows, 1),
                         lambda p, *pref: (jax.lax.div(p, ntx),
                                           jax.lax.rem(p, ntx), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, 1),
                         lambda p, *pref: (jax.lax.div(p, ntx),
                                           jax.lax.rem(p, ntx), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),     # stream (HBM)
        ],
        out_specs=tuple(
            pl.BlockSpec((h8, 128),
                         lambda p, *pref: (jax.lax.div(p, ntx),
                                           jax.lax.rem(p, ntx)),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((h8, 128), jnp.float32),   # aid (lo)
            pltpu.VMEM((h8, 128), jnp.float32),   # ahi
            pltpu.VMEM((h8, 128), jnp.float32),   # a0
            pltpu.VMEM((h8, 128), jnp.float32),   # a1
            pltpu.VMEM((h8, 128), jnp.float32),   # a2
            pltpu.VMEM((h8, 128), jnp.float32),   # aw
            pltpu.VMEM((_RING, _SLAB * 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((_RING,)),
        ],
    )

    v0, v1, v2, mask = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape, out_shape, out_shape),
    )(counts_b.reshape(-1), wls_b[..., None], wln_b[..., None], stream)

    def crop(a):
        return a.reshape(B, h8, ntx * 128)[:, :height, :width]

    return crop(v0), crop(v1), crop(v2), crop(mask) > 0.5

"""Packed-stream strip-walk raster backend: 128 B/triangle, 32 KB DMAs.

Round-3 successor to ``strips.py`` for dense meshes. The strip walk's frame
cost at grid=1024 is dominated not by rasterization arithmetic but by the
record STREAM: (N, 40) f32 row records pad to 128 lanes physically, so every
triangle costs 512 B of HBM to write (setup) and read (kernel) in an
environment whose effective bandwidth is ~20-40 GB/s (BASELINE.md). This
backend packs FOUR triangle groups per 128-lane row:

  lane layout of one stream row-set (8 sublanes x 128 lanes, "super"):
    lanes [32g, 32g+31), g = 0..3:  record columns 0..30 of the 8 triangles
        [super*32 + 8g, super*32 + 8g + 8) -- one triangle per sublane,
        exactly the column layout documented in setup.py;
    lane 32g+31 ("meta"): per-8-triangle-block walk metadata on sublanes
        0..3: ty0 (clamped first tile row), n_trips (tile rows spanned, 0
        for all-invalid blocks), tx0, tx1 (tile-column union) -- the kernel
        reads these as scalars and zero-trips blocks outside its column.

One super = 32 triangles in 4 KB = 128 B/triangle, 4x less HBM than the row
layout, and it is emitted DIRECTLY from triangle setup's column vectors
(setup.setup_cols) -- the (T, 40) intermediate never exists. DMA slabs are
_SLAB supers (32 KB), amortizing the ~5-10 us fixed per-DMA cost this
environment measures (CLAUDE.md) over 256 triangles.

Scheduling is the strip walk's: one grid program per (frame, tile-column)
owning full-height VMEM accumulator strips; per (mesh-row, column) the
worklist stores the interval of supers whose triangles can touch the
column, and each 8-triangle block's stamped (ty0, n_trips) bounds the tile
rows walked. Everything else -- draw-order streaming, no gathers, no
data-dependent shapes, max-id painter merge -- matches strips.py.

Byte-identical to the jnp oracle (tiles.py): identical record column
values (same setup_cols vectors), identical edge/interpolation formulas in
the same f32 op order, identical one-hot winner select.

Parity anchors: rasterization rules pinned by
/root/reference/src/terrain/pipeline.rs:107-140 (CCW + back-cull, no depth
buffer; painter order = last draw wins), gradient triangle
/root/reference/src/lib.rs:73-78.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .setup import NUM_COLS, TILE_H, TILE_W

PCOLS = 32        # lanes per triangle group (31 data columns + meta)
GROUPS = 4        # triangle groups per 128-lane row
GBLOCK = 8        # triangles per group block (one per sublane)
SUPER_T = GROUPS * GBLOCK   # 32 triangles per 8-row "super" (4 KB)
META = NUM_COLS   # meta lane offset within a group (= 31)
# Supers per DMA slab (default 8 = 32 KB, 256 triangles). VF_PACKED_SLAB
# is an experiment knob (read at import): larger slabs amortize the
# ~5-10 us fixed per-DMA cost this environment measures.
_SLAB = int(os.environ.get("VF_PACKED_SLAB", "8"))
_RING = int(os.environ.get("VF_PACKED_RING", "2"))   # DMA ring depth
# Unroll the per-slab super loop into straight-line code with STATIC
# scratch offsets (default on; VF_PACKED_UNROLL=0 restores the fori):
# Mosaic's dynamic sublane addressing costs per-access overhead that an
# 8-way unroll removes -- measured +14% at grid=128 (34.3 -> 39.3
# Mpix/s), +2% at grid=1024. Byte-identical by construction (same ops,
# same order, per-super pl.when guards replacing loop bounds).
_UNROLL = os.environ.get("VF_PACKED_UNROLL", "1") == "1"
# DIAGNOSTIC knobs (break parity; timing experiments only):
#   VF_PACKED_NODMA=1  skip all stream DMAs (pure walk/compute time)
#   VF_PACKED_NOEVAL=1 skip the super walk (pure DMA/loop time)
_NODMA = os.environ.get("VF_PACKED_NODMA", "0") == "1"
_NOEVAL = os.environ.get("VF_PACKED_NOEVAL", "0") == "1"


def build_packed_stream(cols, bbox, row_size: int, width: int, height: int,
                        tile_h: int = TILE_H, tile_w: int = TILE_W,
                        tri_ids=None):
    """Lay out setup columns as the packed stream + per-column worklists.

    cols: tuple of NUM_COLS (T,) f32 vectors (setup.setup_cols).
    bbox: (T, 4) int32 pixel bboxes (invalid encoding x1 < x0).
    row_size: draw-order id stride of one mesh row (2*(G-1) for grid
    meshes; T for arbitrary geometry, degenerating to one interval row).
    tri_ids: optional (T,) int32 TRUE painter ids when the stream order is
    a permutation of draw order (setup.setup_cols_grid's split layout);
    each 8-triangle block's base id is stamped into meta sublane 4 (the
    block's ids must be affine in the sublane index -- the kernel applies
    its static id_stride).

    Returns (stream (SUPERS_PAD*8, 128) f32, wl_start (NTX, ROWS) int32
    absolute super index, wl_n (NTX, ROWS) int32, counts (NTX,) int32,
    nflat (NTX,) int32 total DMA slabs = sum(ceil(wl_n/_SLAB))).
    """
    T = bbox.shape[0]
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    rows = -(-T // row_size)
    spr = -(-row_size // SUPER_T)      # supers per mesh row (row-padded)
    supers = rows * spr

    def rowpad(a, fill):
        a = jnp.concatenate(
            [a, jnp.full((rows * row_size - T,), fill, a.dtype)])
        a = a.reshape(rows, row_size)
        return jnp.pad(a, ((0, 0), (0, spr * SUPER_T - row_size)),
                       constant_values=fill)

    def blockify(a):                   # -> (SUPERS, GROUPS, GBLOCK)
        return a.reshape(supers, GROUPS, GBLOCK)

    tx0 = bbox[:, 0] // tile_w
    tx1 = bbox[:, 1] // tile_w
    ty0 = bbox[:, 2] // tile_h
    ty1 = bbox[:, 3] // tile_h
    valid = bbox[:, 1] >= bbox[:, 0]

    big = jnp.int32(1 << 20)
    tx0b = blockify(rowpad(jnp.where(valid, tx0, big), big))
    tx1b = blockify(rowpad(jnp.where(valid, tx1, -big), -big))
    ty0b = blockify(rowpad(jnp.where(valid, ty0, big), big))
    ty1b = blockify(rowpad(jnp.where(valid, ty1, -big), -big))

    # per 8-triangle block unions (SUPERS, GROUPS)
    b_tx0 = jnp.min(tx0b, axis=2)
    b_tx1 = jnp.max(tx1b, axis=2)
    b_any = b_tx1 >= b_tx0             # any valid triangle in the block
    b_ty0c = jnp.clip(jnp.min(ty0b, axis=2), 0, nty - 1)
    b_trips = jnp.clip(jnp.max(ty1b, axis=2), 0, nty - 1) - b_ty0c + 1
    b_trips = jnp.where(b_any, jnp.maximum(b_trips, 0), 0)
    b_tx0c = jnp.clip(b_tx0, 0, ntx - 1)
    b_tx1c = jnp.clip(b_tx1, 0, ntx - 1)

    # --- stream assembly. Row k of M is record column k per triangle; row
    # PCOLS-1 carries the meta values at in-block ranks 0..3. One 4-D
    # transpose then interleaves the four groups into lanes. (Stacking 128
    # (SUPERS, 8) lane columns directly OOMs: XLA materializes each
    # (N, 1)-shaped stack operand padded to 128 lanes -- 1 GB apiece at
    # grid=1024. The (PCOLS, T) matrix has no pathological padding and the
    # transpose reads/writes tile-local 32x32 chunks.)
    if tri_ids is not None:
        id0_b = blockify(rowpad(tri_ids, jnp.int32(0)))[:, :, 0]
        id0_f = id0_b.astype(jnp.float32)          # exact: ids < 2^24
    else:
        id0_f = jnp.zeros((supers, GROUPS), jnp.float32)
    meta_b = jnp.stack(
        [b_ty0c.astype(jnp.float32), b_trips.astype(jnp.float32),
         b_tx0c.astype(jnp.float32), b_tx1c.astype(jnp.float32),
         id0_f]
        + [jnp.zeros((supers, GROUPS), jnp.float32)] * 3,
        axis=-1)                                   # (SUPERS, GROUPS, 8)
    tpad = supers * SUPER_T
    # One matrix-level row pad (vs NUM_COLS per-column pads, which XLA
    # materializes separately): stack the raw columns, pad the tail, then
    # pad each mesh row to whole supers in one op.
    M0 = jnp.stack(list(cols), axis=0)             # (NUM_COLS, T)
    M0 = jnp.pad(M0, ((0, 0), (0, rows * row_size - T)))
    M0 = M0.reshape(NUM_COLS, rows, row_size)
    M0 = jnp.pad(M0, ((0, 0), (0, 0), (0, spr * SUPER_T - row_size)))
    M = jnp.concatenate([M0.reshape(NUM_COLS, tpad),
                         meta_b.reshape(1, tpad)], axis=0)  # (PCOLS, TPAD)
    stream = (M.reshape(PCOLS, supers, GROUPS, GBLOCK)
              .transpose(1, 3, 2, 0)               # (SUPERS, 8, GROUPS, PCOLS)
              .reshape(supers * 8, 128))
    supers_pad = max(-(-supers // _SLAB) * _SLAB, _SLAB)
    stream = jnp.pad(stream, ((0, (supers_pad - supers) * 8), (0, 0)))

    # --- per (column, mesh-row) super intervals (conservative min..max;
    # stamped per-block tx ranges + coverage reject the extras). One
    # vectorized (NTX, ROWS, SPR) pass instead of a per-column op chain.
    s_tx0 = jnp.min(jnp.where(b_any, b_tx0, big), axis=1)    # (SUPERS,)
    s_tx1 = jnp.max(jnp.where(b_any, b_tx1, -big), axis=1)
    sidx = jnp.arange(spr, dtype=jnp.int32)[None, None, :]
    t0r = s_tx0.reshape(1, rows, spr)
    t1r = s_tx1.reshape(1, rows, spr)
    txs = jnp.arange(ntx, dtype=jnp.int32)[:, None, None]
    ov = (t0r <= txs) & (txs <= t1r)                         # (NTX,ROWS,SPR)
    slo = jnp.min(jnp.where(ov, sidx, spr), axis=2)          # (NTX, ROWS)
    shi = jnp.max(jnp.where(ov, sidx, -1), axis=2)
    start_rc = jnp.arange(rows, dtype=jnp.int32)[None, :] * spr + slo
    n_rc = jnp.maximum(shi - slo + 1, 0).astype(jnp.int32)

    nonempty = n_rc > 0
    gap = int(os.environ.get("VF_PACKED_GAP", "0"))
    if gap > 0:
        # Entry coalescing: merge an interval into its predecessor when the
        # super-index gap between them is <= gap. Each worklist entry pays a
        # DMA-ring prime/drain (~4 us) in the kernel, so at moderate grids
        # (few supers per mesh row, hundreds of rows) per-entry overhead
        # dominates; walking the gap supers instead is idempotent (coverage
        # is exact, painter merge is a max), so pixels are byte-identical.
        e_rc = start_rc + n_rc                   # exclusive interval ends
        e_mask = jnp.where(nonempty, e_rc, -big)
        prev_end = jax.lax.cummax(
            jnp.concatenate([jnp.full((ntx, 1), -big, jnp.int32),
                             e_mask[:, :-1]], axis=1), axis=1)
        new_grp = nonempty & (start_rc - prev_end > gap)
        gid = jnp.cumsum(new_grp.astype(jnp.int32), axis=1) - 1
        colix = jnp.broadcast_to(
            jnp.arange(ntx, dtype=jnp.int32)[:, None], (ntx, rows))
        g_set = jnp.where(new_grp, gid, rows)    # OOB sentinel -> dropped
        g_max = jnp.where(nonempty, gid, rows)
        wl_start = (jnp.zeros((ntx, rows + 1), jnp.int32)
                    .at[colix, g_set].set(start_rc, mode="drop")[:, :rows])
        wl_end = (jnp.zeros((ntx, rows + 1), jnp.int32)
                  .at[colix, g_max].max(e_mask, mode="drop")[:, :rows])
        wl_n = jnp.maximum(wl_end - wl_start, 0)
        counts = jnp.sum(new_grp.astype(jnp.int32), axis=1)  # (NTX,)
        nflat = jnp.sum((wl_n + _SLAB - 1) // _SLAB, axis=1)
        return stream, wl_start, wl_n, counts, nflat
    order = jnp.argsort(~nonempty, axis=1, stable=True)
    wl_start = jnp.take_along_axis(start_rc, order, axis=1)
    wl_n = jnp.take_along_axis(n_rc, order, axis=1)
    counts = jnp.sum(nonempty.astype(jnp.int32), axis=1)     # (NTX,)
    # total DMA slabs per column: drives the kernels' flat software
    # pipeline (fetch cursor _RING slabs ahead of the compute cursor)
    nflat = jnp.sum((wl_n + _SLAB - 1) // _SLAB, axis=1)
    return stream, wl_start, wl_n, counts, nflat


def _packed_kernel(counts_ref,                       # SMEM prefetch (B*NTX,)
                   wls_ref, wln_ref,                 # VMEM (1,1,ROWS,1)
                   stream_ref,                       # HBM packed stream
                   v0_ref, v1_ref, v2_ref, mask_ref, # outputs (H8, 128)
                   aid_ref, ahi_ref, a0_ref, a1_ref, a2_ref, aw_ref,
                   scratch, sem,                     # (RING, SLAB*8, 128)
                   *, ntx, spr, row_size, frame_supers, exact_ids,
                   merged=False, id_meta=False, id_stride=1):
    prog = pl.program_id(0)                          # b * ntx + tx
    tx = jax.lax.rem(prog, ntx)
    frame = jax.lax.div(prog, ntx)
    h8 = v0_ref.shape[0]

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
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, GBLOCK, 1), 1)
    txf = tx.astype(jnp.float32)

    frame_base = frame * frame_supers
    max_slab = frame_supers - _SLAB   # last legal slab start (frame-local)

    def dma(slab_sup, slot):
        # One slab = _SLAB consecutive supers (32 KB). Starts are clamped to
        # the frame, so slabs may re-read earlier supers past an entry's
        # end -- harmless: re-evaluating any triangle anywhere is idempotent
        # under the max-id painter rule (coverage is exact).
        return pltpu.make_async_copy(
            stream_ref.at[pl.ds((frame_base + slab_sup) * 8, _SLAB * 8), :],
            scratch.at[slot], sem.at[slot])

    # Flat software pipeline ACROSS worklist entries. The per-entry ring
    # of earlier rounds primed its DMAs at each entry start and stalled
    # on the first wait: at grid=1024 (~1K entries/column/frame) that
    # serialized issue+latency against compute -- measured 2.5x the sum
    # of the kernel's pure-compute and pure-DMA times. Here a FETCH
    # cursor (ef, jf) = (entry, slab-within-entry) runs _RING slabs ahead
    # of the compute cursor (ec, jc): every slab's fetch is issued while
    # the preceding slabs are still being walked, so only the first
    # _RING fetches ever expose latency. Slot k%_RING is refilled
    # strictly after its last read (CLAUDE.md DMA-ring rule).
    n_entries = counts_ref[0, prog]
    nflat = counts_ref[1, prog]
    del n_entries  # iteration is driven by the flat slab count
    emax = wls_ref.shape[2] - 1

    def entry_info(e):
        ec = jnp.minimum(e, emax)        # clamp: cursor may run past end
        return wls_ref[0, 0, ec, 0], wln_ref[0, 0, ec, 0]

    def advance(e, j):
        _, n = entry_info(e)
        nsl = jax.lax.div(n + _SLAB - 1, _SLAB)
        wrap = j + 1 >= nsl
        return (jnp.where(wrap, e + 1, e),
                jnp.where(wrap, jnp.int32(0), j + 1))

    def fetch(e, j, slot):
        start, _ = entry_info(e)
        dma(jnp.minimum(start + j * _SLAB, max_slab), slot).start()

    def flat_walk(do_sup):
        ef = jnp.int32(0)
        jf = jnp.int32(0)
        if not _NODMA:
            for k in range(_RING):
                @pl.when(k < nflat)
                def _prime(k=k, e=ef, j=jf):
                    fetch(e, j, k)
                ef, jf = advance(ef, jf)

        def flat_body(k, carry):
            ec, jc, ef, jf = carry
            slot = jax.lax.rem(k, _RING)
            start, n = entry_info(ec)
            base_sup = jnp.minimum(start + jc * _SLAB, max_slab)
            if not _NODMA:
                dma(base_sup, slot).wait()
            # Walk ONLY the entry's supers inside this slab: the slab may
            # hold extras before (frame-end clamp) or after (ceil-to-slab
            # tail) the range [start, start+n). Tail supers belong to the
            # NEXT mesh rows; walking them is idempotent but re-pays
            # evaluation their own entry already pays.
            lo = start + jc * _SLAB - base_sup
            hi = jnp.minimum(start + n - base_sup, _SLAB)

            def sup_body(c, carry3):
                do_sup(scratch[slot, pl.ds(c * 8, 8), :], base_sup + c)
                return carry3

            if not _NOEVAL:
                if _UNROLL:
                    for c in range(_SLAB):
                        @pl.when((c >= lo) & (c < hi))
                        def _one(c=c):
                            do_sup(scratch[slot, c * 8:(c + 1) * 8, :],
                                   base_sup + c)
                else:
                    jax.lax.fori_loop(lo, hi, sup_body, 0)

            if not _NODMA:
                @pl.when(k + _RING < nflat)
                def _prefetch():
                    fetch(ef, jf, slot)
            ec, jc = advance(ec, jc)
            ef, jf = advance(ef, jf)
            return (ec, jc, ef, jf)

        jax.lax.fori_loop(0, nflat, flat_body,
                          (jnp.int32(0), jnp.int32(0), ef, jf))


    do_sup = _super_walker(
        (aid_ref, ahi_ref, a0_ref, a1_ref, a2_ref, aw_ref),
        px, txf, lane_ids, spr=spr, row_size=row_size,
        exact_ids=exact_ids, merged=merged, id_meta=id_meta,
        id_stride=id_stride)

    flat_walk(do_sup)


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


def _super_walker(refs, px, txf, lane_ids, *, spr, row_size, exact_ids,
                  merged, id_meta, id_stride):
    """Build the per-super walk closure shared by every packed kernel
    flavor (slab-ring, id-only and resident-stream): given the six
    accumulator refs and the program's column constants, return
    ``do_sup(rec, sup)`` -- evaluate one 32-triangle super's record tile
    against this column strip and painter-merge the winners. Moved
    verbatim from the round-3 kernel body, so every flavor is
    byte-identical by construction."""
    aid_ref, ahi_ref, a0_ref, a1_ref, a2_ref, aw_ref = refs

    def do_sup(rec, sup):
        r = jax.lax.div(sup, spr)
        sup_id0 = r * row_size + (sup - r * spr) * SUPER_T
        if merged and not exact_ids:
            _do_super_merged(rec, sup_id0)
        else:
            for g in range(GROUPS):
                _do_group(rec, g, sup_id0)

    def _do_super_merged(rec, sup_id0):
        # All 4 groups of a super walked in ONE trip loop over the
        # union of their tile-row spans: the per-trip py build,
        # accumulator RMW and loop overhead are paid once per
        # super instead of once per 8-triangle block. Groups of a
        # dense-mesh super are consecutive draw-order triangles,
        # so their y spans nearly coincide (little wasted eval);
        # coverage stays exact, so the merge is byte-identical.
        big = jnp.int32(1 << 20)
        ty0s = big
        tyend = jnp.int32(0)
        for g in range(GROUPS):
            base = g * PCOLS
            ty0g = rec[0, base + META].astype(jnp.int32)
            ntrg = rec[1, base + META].astype(jnp.int32)
            bx0 = rec[2, base + META]
            bx1 = rec[3, base + META]
            ntrg = jnp.where((bx0 <= txf) & (txf <= bx1), ntrg, 0)
            ty0s = jnp.minimum(ty0s, jnp.where(ntrg > 0, ty0g, big))
            tyend = jnp.maximum(tyend,
                                jnp.where(ntrg > 0, ty0g + ntrg, 0))
        ty0u = jnp.minimum(ty0s, tyend)
        ntr_u = jnp.maximum(tyend - ty0u, 0)

        # Zero-trip supers (conservative worklist extras whose
        # stamped tx ranges miss this column) skip the record
        # hoist entirely -- it is ~124 strided reads per super.
        @pl.when(ntr_u > 0)
        def _active_super():
            _walk_super(rec, sup_id0, ty0u, ntr_u)

    def _walk_super(rec, sup_id0, ty0u, ntr_u):
        Cs = [[rec[:, g * PCOLS + k].reshape(1, GBLOCK, 1)
               for k in range(NUM_COLS)] for g in range(GROUPS)]
        if id_meta:
            # true painter ids stamped per block (meta sublane 4);
            # all values < 2^24 so the f32 math is exact
            lane_f = lane_ids.astype(jnp.float32)
            ids_g = [rec[4, g * PCOLS + META]
                     + jnp.float32(id_stride) * lane_f
                     for g in range(GROUPS)]
        else:
            ids_g = [(sup_id0 + g * GBLOCK + lane_ids)
                     .astype(jnp.float32) for g in range(GROUPS)]

        def trip(t, carry4):
            ty = ty0u + t
            py = (jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0)
                  .astype(jnp.float32)
                  + (ty * 8).astype(jnp.float32) + 0.5)
            # Per-group candidate eval, then a SUBLANE-WISE select
            # chain across groups (ids ascend with g, so larger id
            # wins) and ONE cross-sublane one-hot resolve for all
            # 32 triangles -- instead of four max/one-hot/sum
            # reduction sets. The surviving one-hot sum still has
            # exactly one term, so values stay bit-exact.
            mid = None
            for g in range(GROUPS):
                C = Cs[g]

                def col(k):
                    return C[k]

                f0 = col(2) * (px - col(0)) - col(3) * (py - col(1))
                f1 = col(6) * (px - col(4)) - col(7) * (py - col(5))
                f2 = (col(10) * (px - col(8))
                      - col(11) * (py - col(9)))
                a0 = f0 * col(12) + f1 * col(13) + f2 * col(14)
                a1 = f0 * col(15) + f1 * col(16) + f2 * col(17)
                a2 = f0 * col(18) + f1 * col(19) + f2 * col(20)
                aw = f0 * col(21) + f1 * col(22) + f2 * col(23)
                az = f0 * col(25) + f1 * col(26) + f2 * col(27)
                asum = f0 * col(28) + f1 * col(29) + f2 * col(30)
                cov = ((f0 >= 0.0) & (f1 >= 0.0) & (f2 >= 0.0)
                       & (col(24) > 0.0)
                       & (az >= 0.0) & (aw > 0.0)
                       & (asum - az >= 0.0))
                cids = jnp.where(cov, ids_g[g] * jnp.ones_like(f0),
                                 -1.0)
                cand = (cids, a0, a1, a2, aw)
                if mid is None:
                    mid = cand
                else:
                    take = cand[0] > mid[0]
                    mid = tuple(jnp.where(take, n, m)
                                for n, m in zip(cand, mid))
            cids, a0, a1, a2, aw = mid
            wid = jnp.max(cids, axis=1, keepdims=True)
            sel = ((cids == wid) & (wid >= 0.0)).astype(jnp.float32)
            cid = wid[:, 0, :]
            c0 = jnp.sum(a0 * sel, axis=1)
            c1 = jnp.sum(a1 * sel, axis=1)
            c2 = jnp.sum(a2 * sel, axis=1)
            cw = jnp.sum(aw * sel, axis=1)
            sl = pl.ds(ty * 8, 8)
            acc_lo = aid_ref[sl, :]
            better = cid > acc_lo
            aid_ref[sl, :] = jnp.where(better, cid, acc_lo)
            a0_ref[sl, :] = jnp.where(better, c0, a0_ref[sl, :])
            a1_ref[sl, :] = jnp.where(better, c1, a1_ref[sl, :])
            a2_ref[sl, :] = jnp.where(better, c2, a2_ref[sl, :])
            aw_ref[sl, :] = jnp.where(better, cw, aw_ref[sl, :])
            return carry4

        jax.lax.fori_loop(0, ntr_u, trip, 0)

    def _do_group(rec, g, sup_id0):
        base = g * PCOLS

        # Hoist record-column broadcasts out of the trip loop
        # (Mosaic does not reliably CSE dynamic-ref reads across
        # fori iterations; same scheduling as strips.py).
        C = [rec[:, base + k].reshape(1, GBLOCK, 1)
             for k in range(NUM_COLS)]

        def col(k):
            return C[k]

        ty0 = rec[0, base + META].astype(jnp.int32)
        ntr = rec[1, base + META].astype(jnp.int32)
        bx0 = rec[2, base + META]
        bx1 = rec[3, base + META]
        # Zero-trip blocks whose bbox union misses this column: a
        # skipped block costs ~25 ns, a walked one ~500 ns.
        ntr = jnp.where((bx0 <= txf) & (txf <= bx1), ntr, 0)

        ids_i = sup_id0 + g * GBLOCK + lane_ids   # (1,8,1) int32
        if exact_ids:
            id_hi = (ids_i >> 12).astype(jnp.float32)
            id_lo = (ids_i & 4095).astype(jnp.float32)
        elif id_meta:
            ids_f = (rec[4, base + META]
                     + jnp.float32(id_stride)
                     * lane_ids.astype(jnp.float32))
        else:
            ids_f = ids_i.astype(jnp.float32)

        def trip(t, carry4):
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
            cov = ((f0 >= 0.0) & (f1 >= 0.0) & (f2 >= 0.0)
                   & (col(24) > 0.0)
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
            return carry4

        jax.lax.fori_loop(0, ntr, trip, 0)

    return do_sup


def _packed_id_kernel(counts_ref,                    # SMEM prefetch (B*NTX,)
                      wls_ref, wln_ref,              # VMEM (1,1,ROWS,1)
                      stream_ref,                    # HBM packed stream
                      aid_out,                       # output (H8, 128)
                      aid_ref,                       # accumulator scratch
                      scratch, sem,                  # (RING, SLAB*8, 128)
                      *, ntx, spr, row_size, frame_supers):
    """Id-only strip walk: the hot loop transports ONLY the winning
    painter id (a pure max-merge -- no one-hot selects, no payload planes,
    one accumulator RMW). Varyings are reconstructed bit-identically in an
    XLA epilogue that row-gathers each covered pixel's winning record from
    the same stream and re-evaluates the same formulas in the same f32 op
    order (render_gbuffer_packed_batch). Roughly halves the per-trip op
    count vs the full-payload kernel (_packed_kernel), which remains the
    T >= 2^24 split-id fallback."""
    prog = pl.program_id(0)                          # b * ntx + tx
    tx = jax.lax.rem(prog, ntx)
    frame = jax.lax.div(prog, ntx)
    h8 = aid_out.shape[0]

    aid_ref[...] = jnp.full((h8, 128), -1.0, jnp.float32)

    px = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
          .astype(jnp.float32) + (tx * 128).astype(jnp.float32) + 0.5)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, GBLOCK, 1), 1)
    txf = tx.astype(jnp.float32)

    frame_base = frame * frame_supers
    max_slab = frame_supers - _SLAB

    def dma(slab_sup, slot):
        return pltpu.make_async_copy(
            stream_ref.at[pl.ds((frame_base + slab_sup) * 8, _SLAB * 8), :],
            scratch.at[slot], sem.at[slot])

    n_entries = counts_ref[0, prog]

    def entry_body(e, carry):
        start = wls_ref[0, 0, e, 0]
        n = wln_ref[0, 0, e, 0]
        nslab = jax.lax.div(n + _SLAB - 1, _SLAB)

        def slab_start(s):
            return jnp.minimum(start + s * _SLAB, max_slab)

        # Guarded ring: see _packed_kernel (no drain needed).
        if not _NODMA:
            for k in range(_RING):
                @pl.when(k < nslab)
                def _prime(k=k):
                    dma(slab_start(jnp.int32(k)), k).start()

        def slab_body(s, carry2):
            slot = jax.lax.rem(s, _RING)
            if not _NODMA:
                dma(slab_start(s), slot).wait()
            base_sup = slab_start(s)
            # Entry-bounded walk: see _packed_kernel.
            lo = start + s * _SLAB - base_sup
            hi = jnp.minimum(start + n - base_sup, _SLAB)

            def sup_body(c, carry3):
                rec = scratch[slot, pl.ds(c * 8, 8), :]   # (8, 128)
                sup = base_sup + c
                r = jax.lax.div(sup, spr)
                sup_id0 = r * row_size + (sup - r * spr) * SUPER_T
                for g in range(GROUPS):
                    _do_group(rec, g, sup_id0)
                return carry3

            def _do_group(rec, g, sup_id0):
                base = g * PCOLS
                # Only the coverage columns ride the hot loop (22 of 31).
                C = {k: rec[:, base + k].reshape(1, GBLOCK, 1)
                     for k in (list(range(12)) + list(range(21, 31)))}

                def col(k):
                    return C[k]

                ty0 = rec[0, base + META].astype(jnp.int32)
                ntr = rec[1, base + META].astype(jnp.int32)
                bx0 = rec[2, base + META]
                bx1 = rec[3, base + META]
                ntr = jnp.where((bx0 <= txf) & (txf <= bx1), ntr, 0)

                ids_f = (sup_id0 + g * GBLOCK + lane_ids).astype(jnp.float32)

                def trip(t, carry4):
                    ty = ty0 + t
                    py = (jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0)
                          .astype(jnp.float32)
                          + (ty * 8).astype(jnp.float32) + 0.5)
                    f0 = col(2) * (px - col(0)) - col(3) * (py - col(1))
                    f1 = col(6) * (px - col(4)) - col(7) * (py - col(5))
                    f2 = col(10) * (px - col(8)) - col(11) * (py - col(9))
                    aw = f0 * col(21) + f1 * col(22) + f2 * col(23)
                    az = f0 * col(25) + f1 * col(26) + f2 * col(27)
                    asum = f0 * col(28) + f1 * col(29) + f2 * col(30)
                    cov = ((f0 >= 0.0) & (f1 >= 0.0) & (f2 >= 0.0)
                           & (col(24) > 0.0)
                           & (az >= 0.0) & (aw > 0.0) & (asum - az >= 0.0))
                    cids = jnp.where(cov, ids_f * jnp.ones_like(f0), -1.0)
                    wid = jnp.max(cids, axis=1)               # (8, 128)
                    sl = pl.ds(ty * 8, 8)
                    aid_ref[sl, :] = jnp.maximum(aid_ref[sl, :], wid)
                    return carry4

                jax.lax.fori_loop(0, ntr, trip, 0)

            jax.lax.fori_loop(lo, hi, sup_body, 0)

            if not _NODMA:
                @pl.when(s + _RING < nslab)
                def _prefetch():
                    dma(slab_start(s + _RING), slot).start()
            return carry2

        jax.lax.fori_loop(0, nslab, slab_body, 0)
        return carry

    jax.lax.fori_loop(0, n_entries, entry_body, 0)
    aid_out[...] = aid_ref[...]


def _varyings_from_ids(aid, stream, row_size: int, spr: int,
                       frame_supers: int, width: int, height: int):
    """XLA epilogue for the id-only kernel: rebuild (v0, v1, v2, mask).

    aid: (h8, NTX*128) f32 winner ids (-1 empty) of ONE frame;
    stream: this frame's (FRAME_SUPERS*8, 128) packed stream.
    Row-gathers each covered pixel's winning record (fast on TPU) and
    re-evaluates the exact trip formulas at the pixel center -- identical
    f32 ops on identical record columns, so results are bit-equal to the
    full-payload kernel and the tile oracle.
    """
    h8, wpad = aid.shape
    mask = aid >= 0.0
    t = jnp.maximum(aid.astype(jnp.int32), 0)
    r = t // row_size
    off = t - r * row_size
    ls = off // SUPER_T
    g8 = (off - ls * SUPER_T) // GBLOCK
    rank = off - ls * SUPER_T - g8 * GBLOCK
    row = (r * spr + ls) * 8 + rank                   # (h8, WPAD)

    recs = stream[row.reshape(-1)]                    # (N, 128) row gather
    chunk = jnp.take_along_axis(
        recs.reshape(-1, GROUPS, PCOLS), g8.reshape(-1, 1, 1),
        axis=1)[:, 0, :]                              # (N, PCOLS)

    def c(k):
        return chunk[:, k]

    px = (jnp.arange(wpad, dtype=jnp.float32) + 0.5)[None, :]
    py = (jnp.arange(h8, dtype=jnp.float32) + 0.5)[:, None]
    px = jnp.broadcast_to(px, (h8, wpad)).reshape(-1)
    py = jnp.broadcast_to(py, (h8, wpad)).reshape(-1)

    f0 = c(2) * (px - c(0)) - c(3) * (py - c(1))
    f1 = c(6) * (px - c(4)) - c(7) * (py - c(5))
    f2 = c(10) * (px - c(8)) - c(11) * (py - c(9))
    a0 = f0 * c(12) + f1 * c(13) + f2 * c(14)
    a1 = f0 * c(15) + f1 * c(16) + f2 * c(17)
    a2 = f0 * c(18) + f1 * c(19) + f2 * c(20)
    aw = f0 * c(21) + f1 * c(22) + f2 * c(23)
    rcp = 1.0 / jnp.where(jnp.abs(aw) < 1e-20, 1.0, aw)
    shape = (h8, wpad)
    mflat = mask.reshape(-1)
    v0 = jnp.where(mflat, a0 * rcp, 0.0).reshape(shape)
    v1 = jnp.where(mflat, a1 * rcp, 0.0).reshape(shape)
    v2 = jnp.where(mflat, a2 * rcp, 0.0).reshape(shape)
    return (v0[:height, :width], v1[:height, :width], v2[:height, :width],
            mask[:height, :width])


def _packed_kernel_resident_fused(
        counts_ref,                      # SMEM prefetch (2, B*NTX)
        wls_ref, wln_ref,                # VMEM (1, 1, ROWS, 1)
        stream_ref,                      # HBM packed stream (B*SUP8, 128)
        lutp_ref, par_ref,               # VMEM (8, 128) blocks
        img_ref,                         # HBM image (B*NTX*H8, 128) int32
        aid_ref, ahi_ref, a0_ref, a1_ref, a2_ref, aw_ref,  # strip scratch
        stream_v, imgv_ref, ssem, osem,
        *, ntx, spr, row_size, frame_supers, merged=True):
    """Resident-stream fused kernel for moderate meshes (T <= ~40K).

    The slab-ring kernel's flat DMA pipeline is sized for streams that
    dwarf VMEM; at moderate grids the WHOLE frame stream is ~4 MB and the
    per-slab machinery (ring waits, cursor bookkeeping, slab-boundary
    clamps) dominates the walk (measured 4.5 of 8.8 ms/frame at grid=128
    b32, scripts/exp_g128.py). Here the first column program of each
    frame copies the frame's entire stream into VMEM once (~0.1-0.2 ms);
    it stays resident for the other ntx-1 programs (the grid iterates
    frame-major and scratch persists across programs), so the walk reads
    records at VMEM latency with no DMA code in the loop at all.

    The SHIPPED fragment epilogue then runs in-kernel on this column's
    accumulator strips (fragment.terrain_fs_tile -- bit-exact vs the XLA
    terrain_fs, see its docstring) and the packed-u32 strip is DMA'd to
    the HBM image output: no g-buffer materialization, no separate FS
    pass (2.6 ms/frame at grid=128 b32). Restrictions (enforced by
    resident_fused_ok): f32 painter ids (T < 2^24), no split-grid id
    metadata (split streams only apply above 400K triangles), shipped FS.
    """
    prog = pl.program_id(0)
    tx = jax.lax.rem(prog, ntx)
    frame = jax.lax.div(prog, ntx)
    h8 = aid_ref.shape[0]

    # Fetch the frame's whole stream ONCE, on its first column program.
    @pl.when(tx == 0)
    def _load_stream():
        cp = pltpu.make_async_copy(
            stream_ref.at[pl.ds(frame * frame_supers * 8,
                                frame_supers * 8), :],
            stream_v, ssem)
        cp.start()
        cp.wait()

    neg1 = jnp.full((h8, 128), -1.0, jnp.float32)
    zero = jnp.zeros((h8, 128), jnp.float32)
    aid_ref[...] = neg1
    a0_ref[...] = zero
    a1_ref[...] = zero
    a2_ref[...] = zero
    aw_ref[...] = jnp.ones((h8, 128), jnp.float32)

    px = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
          .astype(jnp.float32) + (tx * 128).astype(jnp.float32) + 0.5)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, GBLOCK, 1), 1)
    txf = tx.astype(jnp.float32)

    do_sup = _super_walker(
        (aid_ref, ahi_ref, a0_ref, a1_ref, a2_ref, aw_ref),
        px, txf, lane_ids, spr=spr, row_size=row_size, exact_ids=False,
        merged=merged, id_meta=False, id_stride=1)

    n_entries = counts_ref[0, prog]
    emax = wls_ref.shape[2] - 1

    def entry_body(e, carry):
        ec = jnp.minimum(e, emax)
        start = wls_ref[0, 0, ec, 0]
        n = wln_ref[0, 0, ec, 0]

        def sup_body(c, carry2):
            do_sup(stream_v[pl.ds((start + c) * 8, 8), :], start + c)
            return carry2

        jax.lax.fori_loop(0, n, sup_body, 0)
        return carry

    jax.lax.fori_loop(0, n_entries, entry_body, 0)

    # Fused FS finalize on this column strip (same scalar unpacking and
    # divide as the vtx fused kernel; terrain_fs_tile is the bit-exact
    # in-kernel terrain_fs).
    from .fragment import terrain_fs_tile

    lutv = lutp_ref[...]
    par = par_ref[...]
    hr2 = par[0, 0]
    expo = par[0, 1]
    l0, l1, l2 = par[0, 2], par[0, 3], par[0, 4]
    aw = aw_ref[...]
    rcp = 1.0 / jnp.where(jnp.abs(aw) < 1e-20, 1.0, aw)
    hh = a0_ref[...] * rcp
    xx = a1_ref[...] * rcp
    zz = a2_ref[...] * rcp
    cov = aid_ref[...] >= 0.0
    imgv_ref[...] = terrain_fs_tile(hh, xx, zz, cov, lutv, hr2, expo,
                                    l0, l1, l2)
    out = pltpu.make_async_copy(
        imgv_ref, img_ref.at[pl.ds(prog * h8, h8), :], osem)
    out.start()
    out.wait()


def resident_fused_ok(T: int, width: int, height: int, row_size: int,
                      tile_h: int = TILE_H, tile_w: int = TILE_W) -> bool:
    """Eligibility for the resident-stream fused kernel: the frame's
    whole padded stream plus the seven strip buffers and the FS's
    strip-sized temporaries must fit scoped VMEM, and painter ids must
    ride one f32."""
    if T >= (1 << 24) or row_size <= 0:
        return False
    rows = -(-T // row_size)
    spr = -(-row_size // SUPER_T)
    supers_pad = max(-(-rows * spr // _SLAB) * _SLAB, _SLAB)
    h8 = -(-height // tile_h) * tile_h
    stream_bytes = supers_pad * 8 * 128 * 4
    strip_bytes = h8 * 128 * 4 * 7          # 6 accumulators + imgv
    fs_temp_bytes = h8 * 128 * 4 * 12       # LUT-chain live values
    return stream_bytes + strip_bytes + fs_temp_bytes < 11 * 2**20


def render_image_packed_resident_fused_batch(
        cols_b, bbox_b, lut, h_range, exposure, sun_dir, row_size: int,
        width: int, height: int, tile_h: int = TILE_H, tile_w: int = TILE_W):
    """B frames through the resident-stream fused kernel: rasterize AND
    shade in one pallas_call, returning (B, H, W) uint32 framebuffers.

    Bit-identical to render_gbuffer_packed_batch + fragment.terrain_fs on
    TPU: the scalar prep below runs terrain_fs's exact ops in XLA and the
    in-kernel tile FS is bit-exact per fragment.terrain_fs_tile. Match:
    terrain.wgsl:68-91 runs as one fused GPU stage over the same draw.
    """
    B, T = bbox_b.shape[:2]
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    rows = -(-T // row_size)
    spr = -(-row_size // SUPER_T)
    supers = rows * spr
    supers_pad = max(-(-supers // _SLAB) * _SLAB, _SLAB)
    h8 = nty * tile_h
    assert tile_h == 8 and tile_w == 128, "packed kernel is (8,128)-native"
    assert resident_fused_ok(T, width, height, row_size, tile_h, tile_w)

    def prep_one(cols, bbox):
        return build_packed_stream(cols, bbox, row_size, width, height,
                                   tile_h, tile_w)

    stream_b, wls_b, wln_b, counts_b, nflat_b = jax.vmap(prep_one)(
        cols_b, bbox_b)
    stream = stream_b.reshape(B * supers_pad * 8, 128)
    counts2 = jnp.stack([counts_b.reshape(-1), nflat_b.reshape(-1)])

    # Scalar prep with terrain_fs's exact ops (fragment.py:50,59).
    hr2 = 2.0 * jnp.maximum(h_range, 1e-8)
    sun = jnp.asarray(sun_dir, jnp.float32)
    l = sun / jnp.sqrt(jnp.sum(sun * sun))
    par = jnp.zeros((8, 128), jnp.float32)
    par = par.at[0, 0].set(hr2).at[0, 1].set(exposure)
    par = par.at[0, 2:5].set(l)
    from .fragment import pack_lut_tile
    lutp = pack_lut_tile(jnp.asarray(lut, jnp.float32))

    kernel = functools.partial(
        _packed_kernel_resident_fused, ntx=ntx, spr=spr, row_size=row_size,
        frame_supers=supers_pad,
        merged=os.environ.get("VF_PACKED_MERGE", "1") == "1")

    wl_spec = pl.BlockSpec((1, 1, rows, 1),
                           lambda p, *pref: (jax.lax.div(p, ntx),
                                             jax.lax.rem(p, ntx), 0, 0),
                           memory_space=pltpu.VMEM)
    small = pl.BlockSpec((8, 128), lambda p, *pref: (0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * ntx,),
        in_specs=[wl_spec, wl_spec,
                  pl.BlockSpec(memory_space=pltpu.HBM),   # stream
                  small, small],                          # lutp, par
        out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),),
        scratch_shapes=[pltpu.VMEM((h8, 128), jnp.float32)] * 6
        + [pltpu.VMEM((supers_pad * 8, 128), jnp.float32),  # resident stream
           pltpu.VMEM((h8, 128), jnp.int32),                # image staging
           pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
    )
    (img,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=os.environ.get("VF_PACKED_INTERPRET") == "1",
        out_shape=(jax.ShapeDtypeStruct((B * ntx * h8, 128), jnp.int32),),
    )(counts2, wls_b[..., None], wln_b[..., None], stream, lutp, par)

    img = jax.lax.bitcast_convert_type(img, jnp.uint32)
    img = img.reshape(B, ntx, h8, 128).transpose(0, 2, 1, 3)
    return img.reshape(B, h8, ntx * 128)[:, :height, :width]


def render_gbuffer_packed_batch(cols_b, bbox_b, row_size: int,
                                width: int, height: int,
                                tile_h: int = TILE_H, tile_w: int = TILE_W,
                                force_exact_ids: bool = False,
                                tri_ids=None, id_stride: int = 1):
    """B frames in one pallas_call over packed 128 B/tri streams.

    cols_b: tuple of NUM_COLS (B, T) f32 arrays (vmapped setup_cols);
    bbox_b: (B, T, 4). Returns (v0, v1, v2, mask) each (B, H, W). No
    data-dependent shapes: one compile per (B, T, W, H, row_size).
    force_exact_ids exercises the T >= 2^24 split-id painter compare on
    small scenes (tests). tri_ids/id_stride: true painter ids for
    permuted stream orders (setup.setup_cols_grid); one (T,) vector
    shared by all frames, stamped into block metadata.
    """
    B, T = bbox_b.shape[:2]
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    rows = -(-T // row_size)
    spr = -(-row_size // SUPER_T)
    supers = rows * spr
    supers_pad = max(-(-supers // _SLAB) * _SLAB, _SLAB)
    h8 = nty * tile_h
    assert tile_h == 8 and tile_w == 128, "packed kernel is (8,128)-native"
    assert h8 * 128 * 4 * 6 < 12 * 2**20, "framebuffer too tall for strips"

    id_meta = tri_ids is not None

    def prep_one(cols, bbox):
        return build_packed_stream(cols, bbox, row_size, width, height,
                                   tile_h, tile_w, tri_ids=tri_ids)

    stream_b, wls_b, wln_b, counts_b, nflat_b = jax.vmap(prep_one)(
        cols_b, bbox_b)
    stream = stream_b.reshape(B * supers_pad * 8, 128)
    # scalar prefetch rows: [0] entry counts, [1] flat DMA slab counts
    counts2 = jnp.stack([counts_b.reshape(-1), nflat_b.reshape(-1)])

    exact_ids = T >= (1 << 24) or force_exact_ids
    assert not (exact_ids and id_meta), \
        "split-grid stream carries f32 ids (< 2^24 only)"

    def index_maps():
        return [
            pl.BlockSpec((1, 1, rows, 1),
                         lambda p, *pref: (jax.lax.div(p, ntx),
                                           jax.lax.rem(p, ntx), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, 1),
                         lambda p, *pref: (jax.lax.div(p, ntx),
                                           jax.lax.rem(p, ntx), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),     # stream (HBM)
        ]

    out_shape = jax.ShapeDtypeStruct((B * h8, ntx * 128), jnp.float32)
    out_spec = pl.BlockSpec((h8, 128),
                            lambda p, *pref: (jax.lax.div(p, ntx),
                                              jax.lax.rem(p, ntx)),
                            memory_space=pltpu.VMEM)

    # The id-only kernel halves the hot loop's op count but pays a
    # per-pixel record row-gather in the epilogue (~25 ms/frame at this
    # environment's measured ~10 GB/s gather throughput -- a net LOSS
    # here, a win on spec-bandwidth HBM where the gather is <1 ms).
    # Opt-in until effective bandwidth improves. Trace-time env read: the
    # choice is baked per compiled executable, byte-identical either way.
    use_id_kernel = os.environ.get("VF_PACKED_ID") == "1" and not id_meta
    if use_id_kernel and not exact_ids:
        # id-only kernel + XLA varyings epilogue (bit-identical).
        kernel = functools.partial(
            _packed_id_kernel, ntx=ntx, spr=spr, row_size=row_size,
            frame_supers=supers_pad)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * ntx,),
            in_specs=index_maps(),
            out_specs=(out_spec,),
            scratch_shapes=[
                pltpu.VMEM((h8, 128), jnp.float32),   # aid accumulator
                pltpu.VMEM((_RING, _SLAB * 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((_RING,)),
            ],
        )
        (aid,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(out_shape,),
        )(counts2, wls_b[..., None], wln_b[..., None], stream)
        aid_b = aid.reshape(B, h8, ntx * 128)
        v0, v1, v2, mask = jax.vmap(functools.partial(
            _varyings_from_ids, row_size=row_size, spr=spr,
            frame_supers=supers_pad, width=width, height=height)
        )(aid_b, stream_b.reshape(B, supers_pad * 8, 128))
        return v0, v1, v2, mask

    merged = os.environ.get("VF_PACKED_MERGE", "1") == "1"
    kernel = functools.partial(
        _packed_kernel, ntx=ntx, spr=spr, row_size=row_size,
        frame_supers=supers_pad, exact_ids=exact_ids, merged=merged,
        id_meta=id_meta, id_stride=id_stride)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * ntx,),
        in_specs=index_maps(),
        out_specs=tuple(out_spec for _ in range(4)),
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
    )(counts2, wls_b[..., None], wln_b[..., None], stream)

    def crop(a):
        return a.reshape(B, h8, ntx * 128)[:, :height, :width]

    return crop(v0), crop(v1), crop(v2), crop(mask) > 0.5


def render_gbuffer_packed(cols, bbox, row_size: int,
                          width: int, height: int,
                          tile_h: int = TILE_H, tile_w: int = TILE_W):
    """Single-frame packed strip-walk raster from setup columns."""
    cols_b = tuple(c[None] for c in cols)
    v0, v1, v2, m = render_gbuffer_packed_batch(
        cols_b, bbox[None], row_size, width, height, tile_h, tile_w)
    return v0[0], v1[0], v2[0], m[0]


def render_gbuffer_packed_ref(cols, bbox, row_size: int,
                              width: int, height: int,
                              tile_h: int = TILE_H, tile_w: int = TILE_W,
                              tri_ids=None, id_stride: int = 1):
    """Pure-jnp executable specification of the packed kernel.

    Consumes the exact same stream + worklists as the Pallas kernel and
    applies the same walk in the same f32 op order, with lax loops and
    dynamic_update_slice standing in for VMEM accumulator RMWs. Runs on any
    backend (it is the CPU-mesh fallback for the dense multi-device path,
    _parallel.render_spike_frames) and is the packed path's in-suite
    oracle. Byte-identical to both the Pallas kernel and tiles.py.
    """
    assert tile_h == 8 and tile_w == 128
    T = bbox.shape[0]
    assert T < (1 << 24), "packed ref walker carries painter ids in one f32"
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    rows = -(-T // row_size)
    spr = -(-row_size // SUPER_T)
    h8 = nty * tile_h

    stream, wl_start, wl_n, counts, _nflat = build_packed_stream(
        cols, bbox, row_size, width, height, tile_h, tile_w,
        tri_ids=tri_ids)
    id_meta = tri_ids is not None

    neg1 = jnp.full((h8, ntx * 128), -1.0, jnp.float32)
    zero = jnp.zeros((h8, ntx * 128), jnp.float32)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, GBLOCK, 1), 1)

    def do_column(tx, accs):
        px = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
              .astype(jnp.float32) + jnp.float32(tx * 128) + 0.5)
        txf = jnp.float32(tx)

        def entry_body(e, accs):
            start = wl_start[tx, e]
            n = wl_n[tx, e]

            def sup_body(i, accs):
                sup = start + i
                rec = jax.lax.dynamic_slice(stream, (sup * 8, 0), (8, 128))
                r = sup // spr
                sup_id0 = r * row_size + (sup - r * spr) * SUPER_T
                for g in range(GROUPS):
                    accs = _ref_group(rec, g, sup_id0, accs)
                return accs

            def _ref_group(rec, g, sup_id0, accs):
                base = g * PCOLS

                def col(k):
                    return rec[:, base + k].reshape(1, GBLOCK, 1)

                ty0 = rec[0, base + META].astype(jnp.int32)
                ntr = rec[1, base + META].astype(jnp.int32)
                bx0 = rec[2, base + META]
                bx1 = rec[3, base + META]
                ntr = jnp.where((bx0 <= txf) & (txf <= bx1), ntr, 0)
                if id_meta:
                    ids_f = (rec[4, base + META]
                             + jnp.float32(id_stride)
                             * lane_ids.astype(jnp.float32))
                else:
                    ids_f = (sup_id0 + g * GBLOCK
                             + lane_ids).astype(jnp.float32)

                def trip(t, accs):
                    aid, A0, A1, A2, AW = accs
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
                    az = f0 * col(25) + f1 * col(26) + f2 * col(27)
                    asum = f0 * col(28) + f1 * col(29) + f2 * col(30)
                    cov = ((f0 >= 0.0) & (f1 >= 0.0) & (f2 >= 0.0)
                           & (col(24) > 0.0)
                           & (az >= 0.0) & (aw > 0.0) & (asum - az >= 0.0))
                    cids = jnp.where(cov, ids_f * jnp.ones_like(f0), -1.0)
                    wid = jnp.max(cids, axis=1, keepdims=True)
                    sel = ((cids == wid) & cov).astype(jnp.float32)
                    cid = wid[:, 0, :]
                    c0 = jnp.sum(a0 * sel, axis=1)
                    c1 = jnp.sum(a1 * sel, axis=1)
                    c2 = jnp.sum(a2 * sel, axis=1)
                    cw = jnp.sum(aw * sel, axis=1)

                    at = (ty * 8, tx * 128)

                    def upd(plane, val, better):
                        cur = jax.lax.dynamic_slice(plane, at, (8, 128))
                        return jax.lax.dynamic_update_slice(
                            plane, jnp.where(better, val, cur), at)

                    acc_lo = jax.lax.dynamic_slice(aid, at, (8, 128))
                    better = cid > acc_lo
                    return (jax.lax.dynamic_update_slice(
                                aid, jnp.where(better, cid, acc_lo), at),
                            upd(A0, c0, better), upd(A1, c1, better),
                            upd(A2, c2, better), upd(AW, cw, better))

                return jax.lax.fori_loop(0, ntr, trip, accs)

            return jax.lax.fori_loop(0, n, sup_body, accs)

        return jax.lax.fori_loop(0, counts[tx], entry_body, accs)

    accs = (neg1, zero, zero, zero, jnp.ones((h8, ntx * 128), jnp.float32))
    for tx in range(ntx):
        accs = do_column(tx, accs)
    aid, A0, A1, A2, AW = accs

    covered = aid >= 0.0
    rcp = 1.0 / jnp.where(jnp.abs(AW) < 1e-20, 1.0, AW)

    def crop(a):
        return a[:height, :width]

    return (crop(A0 * rcp), crop(A1 * rcp), crop(A2 * rcp), crop(covered))

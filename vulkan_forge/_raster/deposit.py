"""Candidate-deposit raster backend: MXU one-hot deposit for dense meshes.

The round-2 successor to ``strips.py`` for subpixel-triangle meshes
(grid >= ~512). The strip walk evaluates every 8-triangle block against a
full (8, 128) pixel register although the block only covers ~10 px: ~97%
of its vector work is provably wasted. This kernel instead evaluates
CANDIDATE CELLS -- for each triangle, the <= SLOTS x 8 pixels its bbox can
cover -- at full VPU utilization, then places winners into the framebuffer
strip with MXU one-hot matmuls (the only lane-dynamic placement primitive
the TPU has). Measured structure (scripts/exp_deposit3.py on v5e):

  - one deposit trip (128 tris x 4 slots x 8 rows, 12 matmuls): ~1.1 us,
    of which candidate evaluation is only ~45 ns -- the eval is free, the
    placement costs;
  - in-kernel f32 one-hot matmuls at precision=HIGHEST transport a single
    contributor BIT-EXACTLY, and sums of distinct powers of two exactly
    (both verified on hardware), which the three passes below rely on.

Painter resolution is a three-matmul pipeline per (slab, tile-row) visit:

  pass A  deposit sum(2^rel * covered) per cell in 6 groups of 24 rels
          (exact: distinct powers of two below 2^24). The per-cell winner
          rel is the top set bit, extracted from the f32 exponent field.
  GB      gather the per-cell winner rel BACK to candidate space with the
          transposed one-hots (win @ P^T) -- each candidate learns whether
          it won its cell. No VMEM gathers: the MXU does the transpose.
  pass B  deposit varyings with losers zeroed: every cell now has exactly
          ONE contributor, so the f32 transport is bit-exact and matches
          the jnp oracle's arithmetic (same record columns, same formula).

Work scheduling is a precomputed VISIT LIST: the XLA prep rasterizes each
16-triangle group's (tile-row x tile-column) activity and emits, per
column, the compacted list of ACTIVE (slab, tile-row) pairs. Invalid slabs
and empty tile rows never reach the kernel -- no in-kernel branching, no
per-frame host syncs (the visit capacity rides the same ratchet cache the
list path uses).

The record stream is stored TRANSPOSED -- (REC_WIDTH, T) with triangles on
lanes -- so record columns broadcast for free during candidate evaluation
and, critically, HBM holds 160 B/tri instead of the 512 B/tri an (N, 40)
row layout pads to ((8,128) physical tiling).

Limits (callers fall back to strips/segments outside them):
  - triangle bbox width <= SLOTS px (subpixel/dense meshes; per-frame max
    span is part of the ratchet key);
  - T < 2^24 (painter ids ride one f32);
  - H <= 1024 (full-height accumulator strips in VMEM).

Parity anchors: same record columns and interpolation formulas as
tiles.py; CCW+back-cull and painter order pinned by
src/terrain/pipeline.rs:107-140.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .setup import REC_WIDTH, TILE_H, TILE_W

PX0_COL = 31     # record column: bbox x-origin (f32), stamped by the prep
SLAB_T = 128     # triangles per slab (one deposit's K dimension)
GROUP_T = 16     # triangles per activity group (visit-list resolution)
_NTY_PAD = 128   # ty field width in packed visit entries


class DepositTables(NamedTuple):
    rec_t: jnp.ndarray     # (REC_WIDTH, NSLAB*SLAB_T [*B]) transposed recs
    entries: jnp.ndarray   # (B, NTX, CAP) int32: slab * _NTY_PAD + ty
    counts: jnp.ndarray    # (B, NTX) int32 active visits per column


def build_visit_tables(bbox, width: int, height: int, cap: int,
                       slots: int = 4,
                       tile_h: int = TILE_H, tile_w: int = TILE_W,
                       slab_t: int = SLAB_T, group_t: int = GROUP_T):
    """Per-column compacted lists of active (slab, tile-row) visits.

    Activity is resolved at GROUP_T-triangle granularity (tight y for the
    relief wiggle of terrain rows) and OR-reduced to slabs, so a slab is
    visited only for tile rows where one of its 16-triangle groups can
    actually cover pixels.
    Returns (entries (NTX, CAP) int32, counts (NTX,) int32, overflow bool).
    ``overflow`` also trips when any triangle's bbox is wider than
    ``slots`` px -- rendering would silently drop its rightmost cells, so
    the caller must fall back (the ratchet prepass normally prevents this;
    the flag catches later frames exceeding the ratcheted maximum).
    """
    T = bbox.shape[0]
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    nslab = -(-T // slab_t)
    ngroup = nslab * (slab_t // group_t)
    pad = ngroup * group_t - T

    tx0 = bbox[:, 0] // tile_w
    tx1 = bbox[:, 1] // tile_w
    ty0 = jnp.clip(bbox[:, 2] // tile_h, 0, nty - 1)
    ty1 = jnp.clip(bbox[:, 3] // tile_h, 0, nty - 1)
    valid = bbox[:, 1] >= bbox[:, 0]

    def rp(a, fill):
        a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(ngroup, group_t)

    big = jnp.int32(1 << 20)
    g_tx0 = rp(jnp.where(valid, tx0, big), big)
    g_tx1 = rp(jnp.where(valid, tx1, -big), -big)
    g_ty0 = rp(jnp.where(valid, ty0, big), big)
    g_ty1 = rp(jnp.where(valid, ty1, -big), -big)

    tys = jnp.arange(nty, dtype=jnp.int32)
    gsl = slab_t // group_t

    entries_c = []
    counts_c = []
    for c in range(ntx):
        ov = (g_tx0 <= c) & (c <= g_tx1)                     # (NG, 16)
        glo = jnp.min(jnp.where(ov, g_ty0, big), axis=1)     # (NG,)
        ghi = jnp.max(jnp.where(ov, g_ty1, -big), axis=1)
        act_g = ((glo[:, None] <= tys[None, :])
                 & (tys[None, :] <= ghi[:, None]))           # (NG, NTY)
        act_s = jnp.any(act_g.reshape(nslab, gsl, nty), axis=1)  # (NSLAB,NTY)
        flat = act_s.reshape(-1)
        # visit order: slab-major (DMA locality), ty ascending within slab
        idx = jnp.nonzero(flat, size=cap, fill_value=nslab * nty)[0]
        slab = (idx // nty).astype(jnp.int32)
        ty = (idx - slab * nty).astype(jnp.int32)
        ent = jnp.where(idx < nslab * nty,
                        slab * _NTY_PAD + ty, -1).astype(jnp.int32)
        entries_c.append(ent)
        counts_c.append(jnp.sum(flat.astype(jnp.int32)))
    entries = jnp.stack(entries_c)                           # (NTX, CAP)
    counts_raw = jnp.stack(counts_c)
    span_x = jnp.where(valid, bbox[:, 1] - bbox[:, 0] + 1, 0)
    overflow = jnp.any(counts_raw > cap) | (span_x.max() > slots)
    return entries, jnp.minimum(counts_raw, cap), overflow


def build_rec_t(records, bbox):
    """Slab-blocked transposed record stream with PX0 stamped.

    records: (T+1, REC_WIDTH) from triangle_setup; bbox: (T, 4).
    Returns (NSLAB*REC_WIDTH, 128) f32: slab s occupies rows
    [s*REC_WIDTH, (s+1)*REC_WIDTH), columns = its 128 triangles (lanes).
    Row-contiguous slabs keep every DMA a full-width, 8-row-aligned slice;
    HBM cost is 160 B/triangle (vs 512 B/tri for (N, 40) row records,
    which pad to 128 lanes physically).
    """
    T = bbox.shape[0]
    nslab = -(-T // SLAB_T)
    rec = records[:T].at[:, PX0_COL].set(bbox[:, 0].astype(jnp.float32))
    rec = jnp.pad(rec, ((0, nslab * SLAB_T - T), (0, 0)))
    return (rec.reshape(nslab, SLAB_T, REC_WIDTH)
            .transpose(0, 2, 1).reshape(nslab * REC_WIDTH, SLAB_T))


def visit_counts(bbox, width: int, height: int,
                 tile_h: int = TILE_H, tile_w: int = TILE_W,
                 slab_t: int = SLAB_T, group_t: int = GROUP_T) -> jnp.ndarray:
    """Exact per-column active-visit counts (host ratchet prepass; no
    entry materialization)."""
    T = bbox.shape[0]
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    nslab = -(-T // slab_t)
    ngroup = nslab * (slab_t // group_t)
    pad = ngroup * group_t - T

    tx0 = bbox[:, 0] // tile_w
    tx1 = bbox[:, 1] // tile_w
    ty0 = jnp.clip(bbox[:, 2] // tile_h, 0, nty - 1)
    ty1 = jnp.clip(bbox[:, 3] // tile_h, 0, nty - 1)
    valid = bbox[:, 1] >= bbox[:, 0]

    def rp(a, fill):
        a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(ngroup, group_t)

    big = jnp.int32(1 << 20)
    g_tx0 = rp(jnp.where(valid, tx0, big), big)
    g_tx1 = rp(jnp.where(valid, tx1, -big), -big)
    g_ty0 = rp(jnp.where(valid, ty0, big), big)
    g_ty1 = rp(jnp.where(valid, ty1, -big), -big)
    tys = jnp.arange(nty, dtype=jnp.int32)
    gsl = slab_t // group_t

    counts = []
    for c in range(ntx):
        ov = (g_tx0 <= c) & (c <= g_tx1)
        glo = jnp.min(jnp.where(ov, g_ty0, big), axis=1)
        ghi = jnp.max(jnp.where(ov, g_ty1, -big), axis=1)
        act_g = ((glo[:, None] <= tys[None, :])
                 & (tys[None, :] <= ghi[:, None]))
        act_s = jnp.any(act_g.reshape(nslab, gsl, nty), axis=1)
        counts.append(jnp.sum(act_s.astype(jnp.int32)))
    return jnp.stack(counts)


def _deposit_kernel(counts_ref,                     # scalar prefetch (B*NTX,)
                    entries_ref,                    # VMEM (1, 1, CAP, 1)
                    rect_ref,                       # HBM (REC, NSLAB*128 [*B])
                    v0_ref, v1_ref, v2_ref, mask_ref,   # outputs (H8, 128)
                    aid_ref, a0_ref, a1_ref, a2_ref, aw_ref,
                    scratch, lhs_ref, sem,          # (RING, REC, 128) slabs
                    *, ntx, nty, frame_slabs, slots):
    prog = pl.program_id(0)
    tx = jax.lax.rem(prog, ntx)
    frame = jax.lax.div(prog, ntx)
    h8 = v0_ref.shape[0]

    neg1 = jnp.full((h8, 128), -1.0, jnp.float32)
    zero = jnp.zeros((h8, 128), jnp.float32)
    aid_ref[...] = neg1
    a0_ref[...] = zero
    a1_ref[...] = zero
    a2_ref[...] = zero
    aw_ref[...] = jnp.ones((h8, 128), jnp.float32)

    n = counts_ref[prog]
    frame_base = frame * frame_slabs

    def slab_of(e):
        ent = entries_ref[0, 0, e, 0]
        return jax.lax.div(ent, _NTY_PAD)

    def dma(e, slot):
        slab = slab_of(jnp.minimum(e, n - 1))
        row0 = (frame_base + slab) * REC_WIDTH
        return pltpu.make_async_copy(
            rect_ref.at[pl.ds(row0, REC_WIDTH), :],
            scratch.at[slot], sem.at[slot])

    @pl.when(n > 0)
    def _():
        dma(jnp.int32(0), 0).start()
        dma(jnp.int32(1), 1).start()

    dy = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(jnp.float32)
    xio_c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1).astype(jnp.float32)
    xio_s = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    grp = lane // 24
    pw = jnp.exp2((lane - grp * 24).astype(jnp.float32))
    lane_f = lane.astype(jnp.float32)
    col_x0 = (tx * 128).astype(jnp.float32)

    def hi_dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def body(e, carry):
        slot = jax.lax.rem(e, 3)
        dma(e, slot).wait()
        # Refill slot (e+2)%3 immediately: with a 3-deep ring it is
        # neither the slot being read (e%3) nor the one in flight
        # ((e+1)%3), so the prefetch is race-free by construction even if
        # alias analysis cannot order dynamic-slot accesses.
        dma(e + 2, jax.lax.rem(e + 2, 3)).start()
        ent = entries_ref[0, 0, e, 0]
        slab = jax.lax.div(ent, _NTY_PAD)
        ty = ent - slab * _NTY_PAD
        recs = scratch[slot]                       # (REC, 128) tris on lanes

        def col(k):
            return recs[k, :].reshape(1, 128)

        py = dy + (ty * 8).astype(jnp.float32) + 0.5
        px0_rel = col(PX0_COL) - col_x0            # (1,128) window-relative
        px0_colT = px0_rel.T                       # (128,1) for P build

        def eval_slot(s):
            px = col(PX0_COL) + (jnp.float32(s) + 0.5)
            f0 = col(2) * (px - col(0)) - col(3) * (py - col(1))
            f1 = col(6) * (px - col(4)) - col(7) * (py - col(5))
            f2 = col(10) * (px - col(8)) - col(11) * (py - col(9))
            aw = f0 * col(21) + f1 * col(22) + f2 * col(23)
            az = f0 * col(25) + f1 * col(26) + f2 * col(27)
            asum = f0 * col(28) + f1 * col(29) + f2 * col(30)
            cov = ((f0 >= 0.0) & (f1 >= 0.0) & (f2 >= 0.0)
                   & (col(24) > 0.0)
                   & (az >= 0.0) & (aw > 0.0) & (asum - az >= 0.0))
            covf = cov.astype(jnp.float32)
            a0 = f0 * col(12) + f1 * col(13) + f2 * col(14)
            a1 = f0 * col(15) + f1 * col(16) + f2 * col(17)
            a2 = f0 * col(18) + f1 * col(19) + f2 * col(20)
            return covf, a0, a1, a2, aw

        # Pass A. The one-hots and the (cheap) evaluation are recomputed in
        # the second loop rather than carried across it: retaining
        # slots x (128,128) one-hots would spill the vector registers.
        WA = jnp.zeros((48, 128), jnp.float32)
        WB = jnp.zeros((32, 128), jnp.float32)
        for s in range(slots):
            covf, a0, a1, a2, aw = eval_slot(s)
            P = (px0_colT + jnp.float32(s) == xio_c).astype(jnp.float32)
            bm = covf * pw
            for g in range(6):
                lhs_ref[pl.ds(g * 8, 8), :] = bm * (grp == g).astype(jnp.float32)
            WA = WA + hi_dot(lhs_ref[0:48, :], P)

        # winner rel per cell from the six exact bitmask planes
        win = jnp.full((8, 128), -1.0, jnp.float32)
        for g in range(6):
            gm = WA[g * 8:(g + 1) * 8, :]
            bits = pltpu.bitcast(gm, jnp.int32)
            expo = (((bits >> 23) & 0xFF) - 127).astype(jnp.float32)
            win = jnp.where(gm > 0.0, expo + jnp.float32(g * 24), win)

        # GB + pass B: losers zeroed => exactly one contributor per cell
        for s in range(slots):
            covf, a0, a1, a2, aw = eval_slot(s)
            PT = (px0_rel + jnp.float32(s) == xio_s).astype(jnp.float32)
            P = (px0_colT + jnp.float32(s) == xio_c).astype(jnp.float32)
            back = hi_dot(win, PT)                 # (8dy, 128c) winner rel
            keep = covf * (back == lane_f).astype(jnp.float32)
            lhs_ref[pl.ds(0, 8), :] = keep * a0
            lhs_ref[pl.ds(8, 8), :] = keep * a1
            lhs_ref[pl.ds(16, 8), :] = keep * a2
            lhs_ref[pl.ds(24, 8), :] = keep * aw
            WB = WB + hi_dot(lhs_ref[0:32, :], P)

        win_abs = jnp.where(win >= 0.0,
                            win + (slab * SLAB_T).astype(jnp.float32), -1.0)
        sl = pl.ds(ty * 8, 8)
        better = win_abs > aid_ref[sl, :]
        aid_ref[sl, :] = jnp.where(better, win_abs, aid_ref[sl, :])
        a0_ref[sl, :] = jnp.where(better, WB[0:8, :], a0_ref[sl, :])
        a1_ref[sl, :] = jnp.where(better, WB[8:16, :], a1_ref[sl, :])
        a2_ref[sl, :] = jnp.where(better, WB[16:24, :], a2_ref[sl, :])
        aw_ref[sl, :] = jnp.where(better, WB[24:32, :], aw_ref[sl, :])
        return carry

    jax.lax.fori_loop(0, n, body, 0)

    # Drain the ring: each iteration starts one copy two entries ahead, so
    # exactly two copies (entries n and n+1, clamped) are still in flight.
    @pl.when(n > 0)
    def _():
        dma(n, jax.lax.rem(n, 3)).wait()
        dma(n + 1, jax.lax.rem(n + 1, 3)).wait()

    covered = aid_ref[...] >= 0.0
    aw = aw_ref[...]
    rcp = 1.0 / jnp.where(jnp.abs(aw) < 1e-20, 1.0, aw)
    v0_ref[...] = a0_ref[...] * rcp
    v1_ref[...] = a1_ref[...] * rcp
    v2_ref[...] = a2_ref[...] * rcp
    mask_ref[...] = covered.astype(jnp.float32)


def render_gbuffer_deposit(records, bbox, width: int, height: int,
                           cap: int, slots: int = 4,
                           tile_h: int = TILE_H, tile_w: int = TILE_W):
    """Single-frame candidate-deposit raster. Returns (v0, v1, v2, mask)
    plus a scalar bool overflow flag (visit list truncated -> caller must
    re-render via a fallback path; rendering with a truncated list would
    silently drop geometry)."""
    out, ovf = render_gbuffer_deposit_batch(
        records[None], bbox[None], width, height, cap, slots,
        tile_h, tile_w)
    v0, v1, v2, m = out
    return (v0[0], v1[0], v2[0], m[0]), ovf


def render_gbuffer_deposit_batch(records_b, bbox_b, width: int, height: int,
                                 cap: int, slots: int = 4,
                                 tile_h: int = TILE_H, tile_w: int = TILE_W):
    """B frames in one pallas_call, grid (B*NTX,)."""
    B = records_b.shape[0]
    T = bbox_b.shape[1]
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    nslab = -(-T // SLAB_T)
    h8 = nty * tile_h
    assert tile_h == 8 and tile_w == 128
    assert T < (1 << 24), "deposit path carries painter ids in one f32"
    assert cap <= 16384, "deposit entries block exceeds scoped VMEM"
    assert nty <= _NTY_PAD
    # Five accumulator strips + outputs must fit VMEM.
    assert h8 * 128 * 4 * 5 < 12 * 2**20, "framebuffer too tall for deposit"

    tabs = jax.vmap(functools.partial(
        build_visit_tables, width=width, height=height, cap=cap,
        slots=slots, tile_h=tile_h, tile_w=tile_w))(bbox_b)
    entries_b, counts_b, overflow_b = tabs
    rec_t_b = jax.vmap(build_rec_t)(records_b, bbox_b)   # (B, NS*REC, 128)

    kernel = functools.partial(
        _deposit_kernel, ntx=ntx, nty=nty,
        frame_slabs=nslab, slots=slots)

    out_shape = jax.ShapeDtypeStruct((h8, ntx * 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntx,),
        in_specs=[
            # NOTE (cap,1) VMEM blocks pad to 128 lanes physically
            # (cap x 512 B): caps above ~16K exhaust scoped VMEM. The
            # visit-list kernel solves this with a segmented grid; this
            # experimental path keeps the simple layout and asserts.
            pl.BlockSpec((1, 1, cap, 1),
                         lambda p, *pref: (0, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),    # rec_t
        ],
        out_specs=tuple(
            pl.BlockSpec((h8, 128), lambda p, *pref: (0, p),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((h8, 128), jnp.float32),   # aid
            pltpu.VMEM((h8, 128), jnp.float32),   # a0
            pltpu.VMEM((h8, 128), jnp.float32),   # a1
            pltpu.VMEM((h8, 128), jnp.float32),   # a2
            pltpu.VMEM((h8, 128), jnp.float32),   # aw
            pltpu.VMEM((3, REC_WIDTH, SLAB_T), jnp.float32),
            pltpu.VMEM((48, 128), jnp.float32),   # lhs staging
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape, out_shape, out_shape),
    )

    # One pallas_call per frame INSIDE one jit: XLA pins a call's outputs
    # in scoped VMEM, so a fused B-frame grid OOMs at B >= 3 (4 full
    # framebuffer planes x B); per-frame calls sequence in one dispatch
    # with the same amortization and bound VMEM.
    outs = []
    for i in range(B):
        outs.append(call(counts_b[i].reshape(-1),
                         entries_b[i][None, ..., None], rec_t_b[i]))
    v0 = jnp.stack([o[0] for o in outs])
    v1 = jnp.stack([o[1] for o in outs])
    v2 = jnp.stack([o[2] for o in outs])
    mask = jnp.stack([o[3] for o in outs])

    def crop(a):
        return a[:, :height, :width]

    return (crop(v0), crop(v1), crop(v2), crop(mask) > 0.5), jnp.any(overflow_b)


# ---------------------------------------------------------------------------
# Visit-list strip kernel: the deposit SCHEDULER driving the strips ARITHMETIC.
#
# The measured trip economics flip below slab scale: a strips-style 8-triangle
# visit costs ~0.5 us (no matmuls) while a 128-triangle deposit trip costs
# ~1.1-2.4 us, and BLOCK-granular activity is tighter in y (~1.3 tile rows vs
# ~2-5 for slabs). For grid~1024 meshes the flat list of active
# (8-tri block, tile-row) visits is ~60K/frame, so this kernel projects to
# ~30-40 ms/frame vs the interval-walking strip kernel's 227-270 ms -- the
# win comes from never visiting invalid blocks, empty tile rows, or paying
# nested-loop overheads. Byte-identical to the jnp oracle (same records,
# same formulas, same max-id painter merge).
# ---------------------------------------------------------------------------

BLOCK_T = 8      # triangles per visit (strips arithmetic, sublane-native)


def _visits_kernel(counts_ref,                      # scalar prefetch (NTX,)
                   entries_ref,                     # VMEM (1,CHUNK,1) seg
                   recs_hbm,                        # HBM (T8, 128)
                   aid_ref, a0_ref, a1_ref, a2_ref, aw_ref,   # persistent outs
                   scratch, sem,                    # (3, 8, 128)
                   *, ntx, nseg, chunk, frame_rows):
    prog = pl.program_id(0)
    seg = jax.lax.rem(prog, nseg)
    colfr = jax.lax.div(prog, nseg)                  # frame * ntx + col
    tx = jax.lax.rem(colfr, ntx)
    frame = jax.lax.div(colfr, ntx)
    h8 = aid_ref.shape[0]

    # Accumulators are the OUTPUT blocks: consecutive seg-programs share
    # the same block (reduction-grid pattern), so the per-program visit
    # chunk stays small enough for VMEM ((cap,1) int32 blocks pad to 128
    # lanes physically -- 32 MB at cap=64K killed the single-program form).
    @pl.when(seg == 0)
    def _():
        aid_ref[...] = jnp.full((h8, 128), -1.0, jnp.float32)
        zero = jnp.zeros((h8, 128), jnp.float32)
        a0_ref[...] = zero
        a1_ref[...] = zero
        a2_ref[...] = zero
        aw_ref[...] = jnp.ones((h8, 128), jnp.float32)

    n_total = counts_ref[colfr]
    n = jnp.clip(n_total - seg * chunk, 0, chunk)
    frame_base = frame * frame_rows

    def block_of(e):
        ent = entries_ref[0, e, 0]
        return jax.lax.div(ent, _NTY_PAD)

    def dma(e, slot):
        blk = block_of(jnp.clip(e, 0, n - 1))
        return pltpu.make_async_copy(
            recs_hbm.at[pl.ds(frame_base + blk * BLOCK_T, BLOCK_T), :],
            scratch.at[slot], sem.at[slot])

    @pl.when(n > 0)
    def _():
        dma(jnp.int32(0), 0).start()
        dma(jnp.int32(1), 1).start()

    px = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
          .astype(jnp.float32) + (tx * 128).astype(jnp.float32) + 0.5)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK_T, 1), 1)

    def body(e, carry):
        slot = jax.lax.rem(e, 3)
        dma(e, slot).wait()
        dma(e + 2, jax.lax.rem(e + 2, 3)).start()   # 3-deep: race-free
        ent = entries_ref[0, e, 0]
        blk = jax.lax.div(ent, _NTY_PAD)
        ty = ent - blk * _NTY_PAD
        rec = scratch[slot]                          # (8, 128)

        def col(k):
            return rec[:, k].reshape(1, BLOCK_T, 1)

        py = (jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0)
              .astype(jnp.float32) + (ty * 8).astype(jnp.float32) + 0.5)
        f0 = col(2) * (px - col(0)) - col(3) * (py - col(1))
        f1 = col(6) * (px - col(4)) - col(7) * (py - col(5))
        f2 = col(10) * (px - col(8)) - col(11) * (py - col(9))
        a0 = f0 * col(12) + f1 * col(13) + f2 * col(14)
        a1 = f0 * col(15) + f1 * col(16) + f2 * col(17)
        a2 = f0 * col(18) + f1 * col(19) + f2 * col(20)
        aw = f0 * col(21) + f1 * col(22) + f2 * col(23)
        az = f0 * col(25) + f1 * col(26) + f2 * col(27)
        asum = f0 * col(28) + f1 * col(29) + f2 * col(30)
        cov = ((f0 >= 0.0) & (f1 >= 0.0) & (f2 >= 0.0) & (col(24) > 0.0)
               & (az >= 0.0) & (aw > 0.0) & (asum - az >= 0.0))

        ids_i = blk * BLOCK_T + lane_ids             # draw-order ids
        cids = jnp.where(cov, ids_i.astype(jnp.float32), -1.0)
        wid = jnp.max(cids, axis=1, keepdims=True)
        sel = ((cids == wid) & cov).astype(jnp.float32)
        cid = wid[:, 0, :]
        c0 = jnp.sum(a0 * sel, axis=1)
        c1 = jnp.sum(a1 * sel, axis=1)
        c2 = jnp.sum(a2 * sel, axis=1)
        cw = jnp.sum(aw * sel, axis=1)

        sl = pl.ds(ty * 8, 8)
        better = cid > aid_ref[sl, :]
        aid_ref[sl, :] = jnp.where(better, cid, aid_ref[sl, :])
        a0_ref[sl, :] = jnp.where(better, c0, a0_ref[sl, :])
        a1_ref[sl, :] = jnp.where(better, c1, a1_ref[sl, :])
        a2_ref[sl, :] = jnp.where(better, c2, a2_ref[sl, :])
        aw_ref[sl, :] = jnp.where(better, cw, aw_ref[sl, :])
        return carry

    jax.lax.fori_loop(0, n, body, 0)

    @pl.when(n > 0)
    def _():
        dma(n, jax.lax.rem(n, 3)).wait()
        dma(n + 1, jax.lax.rem(n + 1, 3)).wait()


def render_gbuffer_visits_batch(records_b, bbox_b, width: int, height: int,
                                cap: int,
                                tile_h: int = TILE_H, tile_w: int = TILE_W):
    """B frames via per-frame pallas calls in one jit (see deposit batch).

    records_b: (B, T+1, REC_WIDTH); bbox_b: (B, T, 4).
    Returns ((v0, v1, v2, mask) each (B,H,W), overflow bool).
    """
    B = records_b.shape[0]
    T = bbox_b.shape[1]
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    nblock = -(-T // BLOCK_T)
    h8 = nty * tile_h
    assert tile_h == 8 and tile_w == 128
    assert T < (1 << 24)
    assert nty <= _NTY_PAD
    assert h8 * 128 * 4 * 5 < 12 * 2**20

    CHUNK = 2048                      # visits per grid program (1 MB block)
    nseg = max(-(-cap // CHUNK), 1)
    cap_pad = nseg * CHUNK

    def one_tables(bbox):
        return build_visit_tables(bbox, width, height, cap_pad,
                                  slots=1 << 20,   # no slot-width limit here
                                  tile_h=tile_h, tile_w=tile_w,
                                  slab_t=BLOCK_T, group_t=BLOCK_T)

    entries_b, counts_b, overflow_b = jax.vmap(one_tables)(bbox_b)
    entries_b = entries_b[..., None]                 # (B, NTX, cap_pad, 1)

    # Pad the record stream to whole blocks (padding rows are the zero
    # sentinel: valid flag 0) and to 128 lanes: Mosaic requires DMA slices
    # lane-aligned to the (8,128) tiling, and the (N,40) row layout is
    # already 128-lane padded physically, so this costs bandwidth only for
    # the materializing copy.
    pad = nblock * BLOCK_T - T
    recs_pad = jnp.pad(records_b[:, :T],
                       ((0, 0), (0, pad + BLOCK_T), (0, 128 - REC_WIDTH)))

    kernel = functools.partial(_visits_kernel, ntx=ntx, nseg=nseg,
                               chunk=CHUNK, frame_rows=0)
    out_shape = jax.ShapeDtypeStruct((h8, ntx * 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntx * nseg,),
        in_specs=[
            pl.BlockSpec((1, CHUNK, 1),
                         lambda p, *pref: (p // nseg, p % nseg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=tuple(
            pl.BlockSpec((h8, 128), lambda p, *pref: (0, p // nseg),
                         memory_space=pltpu.VMEM) for _ in range(5)),
        scratch_shapes=[
            pltpu.VMEM((3, BLOCK_T, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=tuple(out_shape for _ in range(5)))

    v0s, v1s, v2s, masks = [], [], [], []
    for i in range(B):
        aid, a0, a1, a2, aw = call(
            counts_b[i].reshape(-1), entries_b[i], recs_pad[i])
        covered = aid >= 0.0
        rcp = 1.0 / jnp.where(jnp.abs(aw) < 1e-20, 1.0, aw)
        v0s.append(a0 * rcp)
        v1s.append(a1 * rcp)
        v2s.append(a2 * rcp)
        masks.append(covered)
    v0 = jnp.stack(v0s)
    v1 = jnp.stack(v1s)
    v2 = jnp.stack(v2s)
    mask = jnp.stack(masks)

    def crop(a):
        return a[:, :height, :width]

    return (crop(v0), crop(v1), crop(v2), crop(mask) > 0), jnp.any(overflow_b)


def render_gbuffer_visits(records, bbox, width: int, height: int, cap: int,
                          tile_h: int = TILE_H, tile_w: int = TILE_W):
    out, ovf = render_gbuffer_visits_batch(
        records[None], bbox[None], width, height, cap, tile_h, tile_w)
    v0, v1, v2, m = out
    return (v0[0], v1[0], v2[0], m[0]), ovf


def render_gbuffer_visits_kernel_only(recs_pad, entries, counts,
                                      width: int, height: int, cap: int,
                                      tile_h: int = TILE_H,
                                      tile_w: int = TILE_W):
    """The visits pallas call alone on prebuilt operands (profiling)."""
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    h8 = nty * tile_h
    CHUNK = 2048
    nseg = max(-(-cap // CHUNK), 1)
    kernel = functools.partial(_visits_kernel, ntx=ntx, nseg=nseg,
                               chunk=CHUNK, frame_rows=0)
    out_shape = jax.ShapeDtypeStruct((h8, ntx * 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntx * nseg,),
        in_specs=[
            pl.BlockSpec((1, CHUNK, 1),
                         lambda p, *pref: (p // nseg, p % nseg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=tuple(
            pl.BlockSpec((h8, 128), lambda p, *pref: (0, p // nseg),
                         memory_space=pltpu.VMEM) for _ in range(5)),
        scratch_shapes=[
            pltpu.VMEM((3, BLOCK_T, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    call = jax.jit(pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=tuple(out_shape for _ in range(5))))
    return call(counts.reshape(-1), entries[..., None], recs_pad)

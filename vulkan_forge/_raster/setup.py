"""Triangle setup and framebuffer-tile binning (all jnp, jit-friendly).

This is the TPU-native replacement for the fixed-function rasterizer stages
the reference gets from the GPU (primitive assembly, culling, binning).

Geometry conventions (pinned by the reference pipelines):
  - Framebuffer coordinates: x right, y down, pixel centers at +0.5
    (Vulkan/WebGPU rule).
  - Front face = CCW with back-face culling (src/lib.rs:120-121,
    src/terrain/pipeline.rs:126-129). In math shoelace terms a front-facing
    triangle has NEGATIVE area in y-down framebuffer coords, so we use the
    negated edge function F(a,b,p) = dy*(p.x-a.x) - dx*(p.y-a.y); a pixel is
    covered iff all three F >= 0 and the barycentric weights are
    (F0, F1, F2) / (F0+F1+F2) with F_i taken on the edge opposite vertex i.
  - No depth buffer (depth_stencil: None, src/terrain/pipeline.rs:133):
    painter's order means the LAST drawn triangle wins, which for a single
    indexed draw equals "maximum triangle index wins" -- an order-independent
    reduction, which is what makes the whole pipeline deterministic and
    data-parallel on TPU.

Triangle records are (T+1, REC_WIDTH) f32 rows (row T is an always-invalid
sentinel used to pad per-tile lists). Layout:

  [0:4]   edge opp v0: (a.x, a.y, dy, dx) with a=v1, d=v2-v1
  [4:8]   edge opp v1: a=v2, d=v0-v2
  [8:12]  edge opp v2: a=v0, d=v1-v0
  [12:15] varying0/w at (v0, v1, v2)
  [15:18] varying1/w
  [18:21] varying2/w
  [21:24] 1/w at (v0, v1, v2)
  [24]    valid flag (1.0 front-facing & in-front & covers >= 1 pixel center)
  [25:32] reserved

Edges are evaluated relative to their own vertex (F = dy*(px-ax) - dx*(py-ay))
so products stay small for small triangles -- the f32 analog of the hardware's
fixed-point watertight rasterization.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

REC_WIDTH = 32

# Default tile shape: one VPU-native (8, 128) f32 vector register of pixels.
TILE_H = 8
TILE_W = 128


def clip_to_fb(clip: jnp.ndarray, width: int, height: int):
    """Clip space -> framebuffer coords (WebGPU viewport transform).

    clip: (..., 4). Returns (x_fb, y_fb, z_ndc, w_clip), each (...,).
    NDC y-up flips to framebuffer y-down.
    """
    w = clip[..., 3]
    # Guard: w <= 0 vertices are marked invalid downstream; avoid inf/nan here.
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    ndc_x = clip[..., 0] / safe_w
    ndc_y = clip[..., 1] / safe_w
    ndc_z = clip[..., 2] / safe_w
    x_fb = (ndc_x * 0.5 + 0.5) * width
    y_fb = (0.5 - ndc_y * 0.5) * height
    return x_fb, y_fb, ndc_z, w


def triangle_setup(x_fb, y_fb, w_clip, varyings, indices, width: int, height: int):
    """Build (T+1, REC_WIDTH) triangle records.

    x_fb, y_fb, w_clip: (N,) per-vertex framebuffer coords / clip w.
    varyings: (N, 3) per-vertex attributes (perspective-interpolated).
    indices: (T, 3) int32 vertex indices (triangle list order == draw order).
    """
    v0, v1, v2 = indices[:, 0], indices[:, 1], indices[:, 2]

    # Pack all per-vertex data into one matrix and gather ROWS per corner:
    # three (T, 8)-row gathers lower to fast strided DMA gathers, unlike
    # eighteen independent 1-D element gathers (~30x slower on TPU).
    vmat = jnp.stack([x_fb, y_fb, w_clip,
                      varyings[:, 0], varyings[:, 1], varyings[:, 2],
                      jnp.zeros_like(x_fb), jnp.zeros_like(x_fb)], axis=-1)
    c0 = vmat[v0]  # (T, 8)
    c1 = vmat[v1]
    c2 = vmat[v2]
    x0, y0, w0 = c0[:, 0], c0[:, 1], c0[:, 2]
    x1, y1, w1 = c1[:, 0], c1[:, 1], c1[:, 2]
    x2, y2, w2 = c2[:, 0], c2[:, 1], c2[:, 2]

    # Signed double area, math shoelace in framebuffer (y-down) coords.
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    # Front faces (CCW in wgpu terms) have area2 < 0 here; cull back faces
    # and degenerates (cull_mode=Back, src/terrain/pipeline.rs:128).
    front = area2 < 0.0
    # Near-plane guard: all vertices strictly in front of the camera. (The
    # GPU would clip; parity configs keep geometry inside the frustum.)
    in_front = (w0 > 1e-8) & (w1 > 1e-8) & (w2 > 1e-8)
    finite = (jnp.isfinite(x0) & jnp.isfinite(x1) & jnp.isfinite(x2)
              & jnp.isfinite(y0) & jnp.isfinite(y1) & jnp.isfinite(y2))

    # Pixel-center bbox: centers are at integer+0.5.
    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
    px0 = jnp.ceil(xmin - 0.5).astype(jnp.int32)
    px1 = jnp.floor(xmax - 0.5).astype(jnp.int32)
    py0 = jnp.ceil(ymin - 0.5).astype(jnp.int32)
    py1 = jnp.floor(ymax - 0.5).astype(jnp.int32)
    px0 = jnp.maximum(px0, 0)
    py0 = jnp.maximum(py0, 0)
    px1 = jnp.minimum(px1, width - 1)
    py1 = jnp.minimum(py1, height - 1)
    # Covers at least one pixel center inside the framebuffer.
    covers = (px0 <= px1) & (py0 <= py1)

    valid = front & in_front & finite & covers

    T = indices.shape[0]
    rw0 = jnp.where(w0 > 1e-8, 1.0 / w0, 0.0)
    rw1 = jnp.where(w1 > 1e-8, 1.0 / w1, 0.0)
    rw2 = jnp.where(w2 > 1e-8, 1.0 / w2, 0.0)

    cols = [
        x1, y1, y2 - y1, x2 - x1,          # edge opp v0
        x2, y2, y0 - y2, x0 - x2,          # edge opp v1
        x0, y0, y1 - y0, x1 - x0,          # edge opp v2
    ]
    for k in range(3):
        cols += [c0[:, 3 + k] * rw0, c1[:, 3 + k] * rw1, c2[:, 3 + k] * rw2]
    cols += [rw0, rw1, rw2, valid.astype(jnp.float32)]
    zero_col = jnp.zeros_like(x0)
    cols += [zero_col] * (REC_WIDTH - len(cols))
    rec = jnp.stack(cols, axis=-1)  # (T, REC_WIDTH), one fused assembly

    # Sentinel row T: all zeros => valid flag 0 => never covers.
    records = jnp.concatenate([rec, jnp.zeros((1, REC_WIDTH), jnp.float32)], axis=0)

    bbox = jnp.stack([jnp.where(valid, px0, width), jnp.where(valid, px1, -1),
                      jnp.where(valid, py0, height), jnp.where(valid, py1, -1)], axis=-1)
    return records, bbox


class Binning(NamedTuple):
    tile_lists: jnp.ndarray   # (NTY*NTX, C) int32 triangle ids (sentinel=T)
    counts: jnp.ndarray       # (NTY*NTX,) int32 per-tile triangle count


def tile_counts(bbox, width: int, height: int,
                tile_h: int = TILE_H, tile_w: int = TILE_W) -> jnp.ndarray:
    """Per-tile overlapping-triangle counts (for host capacity selection)."""
    nty = -(-height // tile_h)
    ntx = -(-width // tile_w)
    tx0 = bbox[:, 0] // tile_w
    tx1 = bbox[:, 1] // tile_w
    ty0 = bbox[:, 2] // tile_h
    ty1 = bbox[:, 3] // tile_h
    txs = jnp.arange(ntx, dtype=jnp.int32)
    tys = jnp.arange(nty, dtype=jnp.int32)
    ovx = (tx0[:, None] <= txs[None, :]) & (txs[None, :] <= tx1[:, None])  # (T, NTX)
    ovy = (ty0[:, None] <= tys[None, :]) & (tys[None, :] <= ty1[:, None])  # (T, NTY)
    # counts[tile_y, tile_x] = sum_t ovy[t, ty] * ovx[t, tx] -- a matmul.
    counts = jnp.einsum("ty,tx->yx", ovy.astype(jnp.float32), ovx.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    return counts.astype(jnp.int32).reshape(-1)


def tile_span_max(bbox, width: int, height: int,
                  tile_h: int = TILE_H, tile_w: int = TILE_W):
    """Max per-triangle tile-span (sx, sy) -- picks the static scatter K."""
    tx0 = bbox[:, 0] // tile_w
    tx1 = bbox[:, 1] // tile_w
    ty0 = bbox[:, 2] // tile_h
    ty1 = bbox[:, 3] // tile_h
    sx = jnp.maximum(tx1 - tx0 + 1, 0)
    sy = jnp.maximum(ty1 - ty0 + 1, 0)
    return jnp.maximum(sx.max(), 1), jnp.maximum(sy.max(), 1)


def bin_triangles(bbox, width: int, height: int, capacity: int,
                  tile_h: int = TILE_H, tile_w: int = TILE_W,
                  span_x: int = 4, span_y: int = 4,
                  tri_chunk: int = 65536) -> Binning:
    """Bin triangles into per-tile lists of ascending triangle id.

    Deterministic, sort-free scatter binning: each triangle writes its id
    into the (tile, rank) slots of the tiles its bbox spans (at most
    span_x * span_y static slots -- the host sizes these from
    ``tile_span_max``, so nothing can overflow). The rank (position within
    the tile's ascending-id list) comes from a cumulative count over the
    triangle axis; ranks are gathered chunk-locally so memory stays bounded
    for large meshes. Sentinel id T pads unused slots.
    """
    T = bbox.shape[0]
    nty = -(-height // tile_h)
    ntx = -(-width // tile_w)
    ntiles = nty * ntx

    tx0 = bbox[:, 0] // tile_w
    tx1 = bbox[:, 1] // tile_w
    ty0 = bbox[:, 2] // tile_h
    ty1 = bbox[:, 3] // tile_h
    valid = bbox[:, 1] >= bbox[:, 0]

    tile_ids = jnp.arange(ntiles, dtype=jnp.int32)
    ty_of = tile_ids // ntx
    tx_of = tile_ids % ntx

    K = span_x * span_y
    dx = jnp.arange(span_x, dtype=jnp.int32)
    dy = jnp.arange(span_y, dtype=jnp.int32)

    # Output: flat (NT*C + 1) slots, last = dump; init = sentinel id T.
    lists_flat = jnp.full((ntiles * capacity + 1,), T, jnp.int32)
    dump = ntiles * capacity

    n_chunks = -(-T // tri_chunk)
    running = jnp.zeros((ntiles,), jnp.int32)

    for c in range(n_chunks):
        s = c * tri_chunk
        tc = min(tri_chunk, T - s)
        sl = slice(s, s + tc)
        ctx0, ctx1 = tx0[sl], tx1[sl]
        cty0, cty1 = ty0[sl], ty1[sl]
        cvalid = valid[sl]

        # (NT, Tc) chunk overlap + cumulative count along triangles.
        ov = ((ctx0[None, :] <= tx_of[:, None]) & (tx_of[:, None] <= ctx1[None, :])
              & (cty0[None, :] <= ty_of[:, None]) & (ty_of[:, None] <= cty1[None, :])
              & cvalid[None, :])
        csum = running[:, None] + jnp.cumsum(ov.astype(jnp.int32), axis=1)
        running = csum[:, -1]

        # Enumerate each triangle's span slots: tile id + chunk-local rank.
        styx = cty0[:, None] + dy[None, :]                     # (Tc, SY)
        stxx = ctx0[:, None] + dx[None, :]                     # (Tc, SX)
        tile = (styx[:, :, None] * ntx + stxx[:, None, :]).reshape(tc, K)
        ok = ((styx[:, :, None] <= cty1[:, None, None])
              & (stxx[:, None, :] <= ctx1[:, None, None])).reshape(tc, K)
        ok = ok & cvalid[:, None]

        safe_tile = jnp.where(ok, tile, 0)
        t_local = jnp.arange(tc, dtype=jnp.int32)
        flat_idx = safe_tile * tc + t_local[:, None]           # into (NT, Tc)
        rank = csum.reshape(-1)[flat_idx.reshape(-1)].reshape(tc, K) - 1

        slot = jnp.where(ok & (rank < capacity),
                         safe_tile * capacity + rank, dump)
        vals = jnp.broadcast_to((t_local + s)[:, None], (tc, K)).reshape(-1)
        lists_flat = lists_flat.at[slot.reshape(-1)].set(
            vals, mode="drop", indices_are_sorted=False, unique_indices=False)

    lists = lists_flat[:-1].reshape(ntiles, capacity)
    return Binning(tile_lists=lists, counts=running)

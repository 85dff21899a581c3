#!/usr/bin/env python3
"""Sub-stage timing of the CURRENT split-grid packed path (grid=1024 b4).

Stages (each its own jit, sum-forced per the CLAUDE.md measurement rule):
  cols      VS + clip_to_fb + setup_cols_grid (31 column vectors + bbox)
  stream    cols + build_packed_stream (pack + transpose + tables)
  gbuffer   stream + pallas kernel (no fragment)
  full      the shipped _terrain_render_batch_packed (kernel + fragment)

Usage: python scripts/dev_split_stages.py [grid] [batch]
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vulkan_forge import _colormap, _mesh
from vulkan_forge._camera import look_at_rh, perspective_wgpu
from vulkan_forge._raster import packed as pk
from vulkan_forge._raster import pipeline as P

W, H = 800, 600
GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
REPS = 3
RS = 2 * (GRID - 1)

xyuv = jnp.asarray(_mesh.build_grid_xyuv(GRID)[0])
indices = jnp.asarray(
    _mesh.build_grid_xyuv(GRID)[1].astype(np.int32).reshape(-1, 3))
heights = jnp.zeros((1, 1), jnp.float32)
LUT = jnp.asarray(_colormap.build_lut("viridis")[0])
SUN = jnp.asarray(np.array([0.5, 1.0, 0.3], np.float32)
                  / np.linalg.norm([0.5, 1.0, 0.3]))
COM = (jnp.float32(-0.5), jnp.float32(0.5), jnp.float32(1.0), SUN,
       jnp.float32(1.0), jnp.float32(1.0))


def cams(n, phase):
    vs, ps = [], []
    for i in range(n):
        a = 2 * math.pi * i / n + phase
        vs.append(look_at_rh((3 * math.cos(a), 2.0, 3 * math.sin(a)),
                             (0, 0, 0), (0, 1, 0)))
        ps.append(perspective_wgpu(np.float32(math.radians(45.0)),
                                   np.float32(W / H), np.float32(0.1),
                                   np.float32(100.0)))
    return jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ps))


CAMS = [cams(B, 0.31 * r) for r in range(REPS + 1)]


def prep_cols(view, proj):
    return P._terrain_cols(xyuv, indices, heights, view, proj,
                           jnp.float32(1.0), jnp.float32(1.0), W, H,
                           "shipped", grid_n=GRID)


RS2, TRI_IDS = None, None
if P._grid_split_ok(GRID, indices):
    from vulkan_forge._raster.setup import grid_split_ids
    RS2, TRI_IDS = grid_split_ids(GRID)


@jax.jit
def s_cols(views, projs):
    cols_b, bbox_b = jax.vmap(prep_cols)(views, projs)
    acc = jnp.sum(bbox_b)
    for c in cols_b:
        acc = acc + jnp.sum(c).astype(jnp.int32)
    return acc


@jax.jit
def s_stream(views, projs):
    cols_b, bbox_b = jax.vmap(prep_cols)(views, projs)
    rs = RS2 if RS2 is not None else RS

    def one(cols, bbox):
        stream, wls, wln, cnt, _nf = pk.build_packed_stream(
            cols, bbox, rs, W, H, tri_ids=TRI_IDS)
        return (jnp.sum(stream), jnp.sum(wls) + jnp.sum(wln)
                + jnp.sum(cnt))

    a, b = jax.vmap(one)(cols_b, bbox_b)
    return jnp.sum(a), jnp.sum(b)


@jax.jit
def s_gbuffer(views, projs):
    cols_b, bbox_b = jax.vmap(prep_cols)(views, projs)
    rs = RS2 if RS2 is not None else RS
    tri_ids = TRI_IDS
    stride = 2 if RS2 is not None else 1
    v0, v1, v2, m = pk.render_gbuffer_packed_batch(
        cols_b, bbox_b, rs, W, H, tri_ids=tri_ids, id_stride=stride)
    return (jnp.sum(v0) + jnp.sum(v1) + jnp.sum(v2)
            + jnp.sum(m.astype(jnp.float32)))


@jax.jit
def s_full(views, projs):
    img = P._terrain_render_batch_packed.__wrapped__(
        xyuv, indices, heights, views, projs, LUT, *COM, W, H, RS,
        fs_mode="shipped", grid_n=GRID)
    return jnp.sum(img & 0xFF)


def timeit(name, fn):
    jax.device_get(fn(*CAMS[-1]))
    t0 = time.perf_counter()
    for r in range(REPS):
        jax.device_get(fn(*CAMS[r]))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:10s} {dt*1e3:9.2f} ms/batch ({dt*1e3/B:8.2f} ms/frame)",
          flush=True)


if __name__ == "__main__":
    print(f"grid={GRID} b{B} split={RS2 is not None} "
          f"gap={os.environ.get('VF_PACKED_GAP', '0')}")
    timeit("cols", s_cols)
    timeit("stream", s_stream)
    timeit("gbuffer", s_gbuffer)
    timeit("full", s_full)

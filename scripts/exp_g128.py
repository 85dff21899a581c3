#!/usr/bin/env python3
"""Honest (sum-forced) stage split of the packed path at grid=128 b32:
where do the ~8.8 ms/frame go once batching has amortized the dispatch?

Stages (each its own jit, checksum-forced with a FULL reduction):
  vs        -- terrain_vs + clip_to_fb only
  cols      -- + setup_cols (gathered; the shipped g128 config)
  stream    -- + build_packed_stream (stream + worklist tables)
  gbuffer   -- + pallas kernel (VF_PACKED_SPLIT_FS-style planes)
  full      -- + fragment epilogue (the shipped fused executable)

Usage: python scripts/exp_g128.py [grid] [B] [reps]
"""
from __future__ import annotations

import functools
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
from vulkan_forge._raster import pipeline as P, transform
from vulkan_forge._raster.setup import clip_to_fb, setup_cols

W, H = 800, 600
GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
RS = 2 * (GRID - 1)

xyuv_np, idx_np = _mesh.build_grid_xyuv(GRID)
xyuv = jnp.asarray(xyuv_np)
indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
heights = jnp.zeros((1, 1), jnp.float32)
LUT = jnp.asarray(_colormap.build_lut("viridis")[0])
SUN = jnp.asarray(np.array([0.5, 1.0, 0.3], np.float32)
                  / np.linalg.norm([0.5, 1.0, 0.3]))


def cams(n, phase):
    vs, ps = [], []
    for i in range(n):
        a = 2 * math.pi * i / n + phase
        vs.append(look_at_rh((3 * math.cos(a), 2.0, 3 * math.sin(a)),
                             (0, 0, 0), (0, 1, 0)))
        ps.append(perspective_wgpu(np.float32(math.radians(45)),
                                   np.float32(W / H), np.float32(0.1),
                                   np.float32(100)))
    return jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ps))


CAMS = [cams(B, 0.31 * r) for r in range(REPS + 1)]


def vs_one(view, proj):
    clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                      jnp.float32(1.0), jnp.float32(1.0))
    x, y, z, w = clip_to_fb(clip, W, H)
    return x, y, z, w, vary


@jax.jit
def stage_vs(views, projs):
    outs = jax.vmap(vs_one)(views, projs)
    return sum(jnp.sum(o) for o in outs[:4]) + jnp.sum(outs[4])


@jax.jit
def stage_cols(views, projs):
    def one(view, proj):
        x, y, z, w, vary = vs_one(view, proj)
        return setup_cols(x, y, z, w, vary, indices, W, H)
    cols_b, bbox_b = jax.vmap(one)(views, projs)
    return sum(jnp.sum(c) for c in cols_b) + jnp.sum(bbox_b)


@jax.jit
def stage_stream(views, projs):
    def one(view, proj):
        x, y, z, w, vary = vs_one(view, proj)
        cols, bbox = setup_cols(x, y, z, w, vary, indices, W, H)
        return pk.build_packed_stream(tuple(cols), bbox, RS, W, H)
    outs = jax.vmap(one)(views, projs)
    return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(outs))


@jax.jit
def stage_gbuffer(views, projs):
    planes = P._terrain_gbuffer_batch_packed.__wrapped__(
        xyuv, indices, heights, views, projs, jnp.float32(1.0),
        jnp.float32(1.0), W, H, RS, fs_mode="shipped", grid_n=GRID)
    return sum(jnp.sum(p.astype(jnp.float32)) for p in planes)


@jax.jit
def stage_full(views, projs):
    out = P._terrain_render_batch_packed.__wrapped__(
        xyuv, indices, heights, views, projs, LUT, jnp.float32(-0.5),
        jnp.float32(0.5), jnp.float32(1.0), SUN, jnp.float32(1.0),
        jnp.float32(1.0), W, H, RS, fs_mode="shipped", grid_n=GRID)
    return jnp.sum(out & 0xFF)


def timeit(name, fn):
    jax.device_get(fn(*CAMS[-1]))  # compile + warm (never timed)
    t0 = time.perf_counter()
    for r in range(REPS):
        jax.device_get(fn(*CAMS[r]))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:10s} {dt * 1e3:8.2f} ms/batch ({dt * 1e3 / B:6.2f} ms/frame)")


def main():
    for name, fn in (("vs", stage_vs), ("cols", stage_cols),
                     ("stream", stage_stream), ("gbuffer", stage_gbuffer),
                     ("full", stage_full)):
        timeit(name, fn)


if __name__ == "__main__":
    main()

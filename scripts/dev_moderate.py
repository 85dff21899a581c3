#!/usr/bin/env python3
"""Moderate-mesh (grid=128) stage breakdown at 800x600: where do the
14 ms/frame go? Stages: records+bin, gbuffer-only, fragment-only, fused
full. SUM-forced (slices let XLA prune the measured compute)."""
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
from vulkan_forge._raster import fragment, pipeline as P, tiles, transform
from vulkan_forge._raster import pallas_backend
from vulkan_forge._raster.setup import bin_triangles, clip_to_fb, triangle_setup

W, H = 800, 600
GRID = int(os.environ.get("VF_GRID", "128"))
B = int(os.environ.get("VF_B", "8"))
REPS = 3

LUT = jnp.asarray(_colormap.build_lut("viridis")[0])
SUN = jnp.asarray(np.array([0.5, 1.0, 0.3], np.float32)
                  / np.linalg.norm([0.5, 1.0, 0.3]))

xyuv_np, idx_np = _mesh.build_grid_xyuv(GRID)
xyuv = jnp.asarray(xyuv_np)
indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
heights = jnp.zeros((1, 1), jnp.float32)


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


SETS = [cams(B, 0.31 * r) for r in range(REPS + 1)]

views0, projs0 = SETS[0]
cmax, sx, sy = jax.device_get(P._terrain_batch_counts(
    xyuv, indices, heights, views0, projs0, jnp.float32(1.0),
    jnp.float32(1.0), W, H))
CAP = P._round_capacity(int(cmax) * 2)
SX = P._round_span(int(sx))
SY = P._round_span(int(sy))
print(f"grid={GRID} b{B} cap={CAP} span=({SX},{SY})")


def frame_records(view, proj):
    clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                      jnp.float32(1.0), jnp.float32(1.0))
    x, y, z, w = clip_to_fb(clip, W, H)
    return triangle_setup(x, y, z, w, vary, indices, W, H)


@jax.jit
def stage_records_bin(views, projs):
    outs = []
    for i in range(B):
        records, bbox = frame_records(views[i], projs[i])
        binning = bin_triangles(bbox, W, H, CAP, span_x=SX, span_y=SY)
        outs.append(jnp.sum(records) + jnp.sum(binning.tile_lists)
                    + jnp.sum(binning.counts))
    return jnp.stack(outs)


@jax.jit
def stage_gbuffer(views, projs):
    outs = []
    for i in range(B):
        records, bbox = frame_records(views[i], projs[i])
        binning = bin_triangles(bbox, W, H, CAP, span_x=SX, span_y=SY)
        v0, v1, v2, m = pallas_backend.render_gbuffer(
            records, binning.tile_lists, W, H, counts=binning.counts)
        outs.append(jnp.sum(v0) + jnp.sum(v1) + jnp.sum(v2)
                    + jnp.sum(m.astype(jnp.float32)))
    return jnp.stack(outs)


@jax.jit
def stage_gbuffer_full(views, projs):
    outs = []
    for i in range(B):
        records, bbox = frame_records(views[i], projs[i])
        binning = bin_triangles(bbox, W, H, CAP, span_x=SX, span_y=SY)
        outs.append(pallas_backend.render_gbuffer(
            records, binning.tile_lists, W, H, counts=binning.counts))
    return outs


@jax.jit
def stage_fragment(planes):
    return jnp.stack(
        [jnp.sum(fragment.terrain_fs(v0, v1, v2, m, LUT, jnp.float32(1.0),
                                     jnp.float32(1.0), SUN) & 0xFF)
         for (v0, v1, v2, m) in planes])


@jax.jit
def stage_full(views, projs):
    outs = []
    for i in range(B):
        records, bbox = frame_records(views[i], projs[i])
        outs.append(P._terrain_render_from_records.__wrapped__(
            records, bbox, heights, LUT, jnp.float32(-0.5), jnp.float32(0.5),
            jnp.float32(1.0), SUN, jnp.float32(1.0), jnp.float32(1.0),
            W, H, CAP, SX, SY, fs_mode="shipped", use_pallas=True))
    return jnp.stack([jnp.sum(o & 0xFF) for o in outs])


def timeit(name, fn, args_of):
    fn(*args_of(REPS))
    t0 = time.perf_counter()
    for r in range(REPS):
        jax.device_get(fn(*args_of(r)))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s} {dt*1e3:8.2f} ms/batch ({dt*1e3/B:6.2f} ms/frame)",
          flush=True)
    return dt


def main():
    timeit("records+bin", stage_records_bin, lambda r: SETS[r])
    timeit("gbuffer (recs+bin+kernel)", stage_gbuffer, lambda r: SETS[r])
    planes = [stage_gbuffer_full(*SETS[r]) for r in range(REPS + 1)]
    timeit("fragment only (split jit)", stage_fragment,
           lambda r: (planes[r],))
    timeit("full fused", stage_full, lambda r: SETS[r])


if __name__ == "__main__":
    main()

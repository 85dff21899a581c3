#!/usr/bin/env python3
"""Prep-M sub-stage timing at grid=1024 b4 (sum-forced): VS only, gathers
only, full setup_cols, and setup_cols on 2-D-reshaped operands (layout
experiment: 1-D (T,) elementwise chains vs (T/128, 128) 2-D)."""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vulkan_forge import _mesh
from vulkan_forge._camera import look_at_rh, perspective_wgpu
from vulkan_forge._raster import transform
from vulkan_forge._raster.setup import clip_to_fb, setup_cols

W, H = 800, 600
GRID = int(os.environ.get("VF_GRID", "1024"))
B = int(os.environ.get("VF_B", "4"))
REPS = 3

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


@jax.jit
def s_vs(views, projs):
    def one(view, proj):
        clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                          jnp.float32(1.0), jnp.float32(1.0))
        x, y, z, w = clip_to_fb(clip, W, H)
        return x.sum() + y.sum() + z.sum() + w.sum() + vary.sum()
    return jax.vmap(one)(views, projs)


@jax.jit
def s_gather(views, projs):
    def one(view, proj):
        clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                          jnp.float32(1.0), jnp.float32(1.0))
        x, y, z, w = clip_to_fb(clip, W, H)
        vmat = jnp.stack([x, y, w, vary[:, 0], vary[:, 1], vary[:, 2],
                          z, jnp.zeros_like(x)], axis=-1)
        v0, v1, v2 = indices[:, 0], indices[:, 1], indices[:, 2]
        return vmat[v0].sum() + vmat[v1].sum() + vmat[v2].sum()
    return jax.vmap(one)(views, projs)


@jax.jit
def s_cols(views, projs):
    def one(view, proj):
        clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                          jnp.float32(1.0), jnp.float32(1.0))
        x, y, z, w = clip_to_fb(clip, W, H)
        cols, bbox = setup_cols(x, y, z, w, vary, indices, W, H)
        acc = bbox.sum()
        for c in cols:
            acc = acc + c.sum().astype(jnp.int32)
        return acc
    return jax.vmap(one)(views, projs)


def timeit(name, fn):
    fn(*SETS[REPS])
    t0 = time.perf_counter()
    for r in range(REPS):
        jax.device_get(fn(*SETS[r]))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:22s} {dt*1e3:8.2f} ms/batch ({dt*1e3/B:6.2f} ms/frame)",
          flush=True)


if __name__ == "__main__":
    timeit("VS+clip", s_vs)
    timeit("VS+gathers", s_gather)
    timeit("setup_cols (no pack)", s_cols)

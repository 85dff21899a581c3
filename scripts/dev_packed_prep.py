#!/usr/bin/env python3
"""Packed prep substage timing at grid=1024 b4: M build, +transpose,
+tables (full). SUM-forced: slicing outputs lets XLA prune the compute
being measured (corner and strided slices alike); a full reduction
forces every element while keeping the host transfer tiny."""
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

from vulkan_forge import _mesh
from vulkan_forge._camera import look_at_rh, perspective_wgpu
from vulkan_forge._raster import packed as pk, transform
from vulkan_forge._raster.setup import NUM_COLS, clip_to_fb, setup_cols

W, H = 800, 600
GRID = int(os.environ.get("VF_GRID", "1024"))
B = int(os.environ.get("VF_B", "4"))
REPS = 3
RS = 2 * (GRID - 1)

xyuv_np, idx_np = _mesh.build_grid_xyuv(GRID)
xyuv = jnp.asarray(xyuv_np)
indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
heights = jnp.zeros((1, 1), jnp.float32)

T = int(indices.shape[0])
ROWS = -(-T // RS)
SPR = -(-RS // pk.SUPER_T)
SUPERS = ROWS * SPR
TPAD = SUPERS * pk.SUPER_T


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


def prep_cols(view, proj):
    clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                      jnp.float32(1.0), jnp.float32(1.0))
    x, y, z, w = clip_to_fb(clip, W, H)
    return setup_cols(x, y, z, w, vary, indices, W, H)


def build_m(cols):
    M0 = jnp.stack(list(cols), axis=0)
    M0 = jnp.pad(M0, ((0, 0), (0, ROWS * RS - T)))
    M0 = M0.reshape(NUM_COLS, ROWS, RS)
    M0 = jnp.pad(M0, ((0, 0), (0, 0), (0, SPR * pk.SUPER_T - RS)))
    return M0.reshape(NUM_COLS, TPAD)


@jax.jit
def stage_m(views, projs):
    def one(view, proj):
        cols, bbox = prep_cols(view, proj)
        return build_m(cols)
    M = jax.vmap(one)(views, projs)
    return jnp.sum(M)


@jax.jit
def stage_m_old(views, projs):
    """Round-3-initial construction: per-column rowpad, then stack."""
    def one(view, proj):
        cols, bbox = prep_cols(view, proj)

        def rowpad(a):
            a = jnp.concatenate([a, jnp.zeros((ROWS * RS - T,), a.dtype)])
            return jnp.pad(a.reshape(ROWS, RS),
                           ((0, 0), (0, SPR * pk.SUPER_T - RS))).reshape(TPAD)
        return jnp.stack([rowpad(c) for c in cols], axis=0)
    M = jax.vmap(one)(views, projs)
    return jnp.sum(M)


@jax.jit
def stage_m_t(views, projs):
    def one(view, proj):
        cols, bbox = prep_cols(view, proj)
        M = build_m(cols)
        M = jnp.concatenate([M, jnp.zeros((1, TPAD), jnp.float32)], axis=0)
        return (M.reshape(pk.PCOLS, SUPERS, pk.GROUPS, pk.GBLOCK)
                .transpose(1, 3, 2, 0).reshape(SUPERS * 8, 128))
    S = jax.vmap(one)(views, projs)
    return jnp.sum(S)


@jax.jit
def stage_full(views, projs):
    def one(view, proj):
        cols, bbox = prep_cols(view, proj)
        return pk.build_packed_stream(tuple(cols), bbox, RS, W, H)
    s, wls, wln, counts = jax.vmap(one)(views, projs)
    return (jnp.sum(s), jnp.sum(wls), jnp.sum(counts))


def timeit(name, fn):
    fn(*SETS[REPS])
    t0 = time.perf_counter()
    for r in range(REPS):
        jax.device_get(fn(*SETS[r]))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:24s} {dt*1e3:8.2f} ms/batch ({dt*1e3/B:6.2f} ms/frame)",
          flush=True)


if __name__ == "__main__":
    timeit("prep M", stage_m)
    timeit("prep M (old per-col pad)", stage_m_old)
    timeit("prep M+transpose", stage_m_t)
    timeit("prep full (tables)", stage_full)

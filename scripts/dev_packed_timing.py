#!/usr/bin/env python3
"""Time the packed dense path under the current VF_PACKED_* env knobs.

Usage: VF_PACKED_MERGE=1 VF_PACKED_SLAB=16 python scripts/dev_packed_timing.py [grid] [batch]
Prints one line: knobs, parity check (vs jnp oracle @ grid=64), ms/batch,
Mpix/s. Timings device_get-forced (CLAUDE.md benchmark traps)."""
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
from vulkan_forge._raster import pipeline as P

W, H = 800, 600
GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else (4 if GRID >= 512 else 8)
REPS = 3

LUT = jnp.asarray(_colormap.build_lut("viridis")[0])
SUN = jnp.asarray(np.array([0.5, 1.0, 0.3], np.float32)
                  / np.linalg.norm([0.5, 1.0, 0.3]))
COM = (jnp.float32(-0.5), jnp.float32(0.5), jnp.float32(1.0), SUN,
       jnp.float32(1.0), jnp.float32(1.0))


def cams(n, w, h, phase):
    vs, ps = [], []
    for i in range(n):
        a = 2 * math.pi * i / n + phase
        vs.append(look_at_rh((3 * math.cos(a), 2.0, 3 * math.sin(a)),
                             (0, 0, 0), (0, 1, 0)))
        ps.append(perspective_wgpu(np.float32(math.radians(45.0)),
                                   np.float32(w / h), np.float32(0.1),
                                   np.float32(100.0)))
    return jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ps))


def scene(grid):
    xyuv_np, idx_np = _mesh.build_grid_xyuv(grid)
    return (jnp.asarray(xyuv_np),
            jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3)),
            jnp.zeros((1, 1), jnp.float32))


def packed(xyuv, indices, heights, views, projs, w, h, rs, grid_n=None):
    return P._terrain_render_batch_packed(
        xyuv, indices, heights, views, projs, LUT, *COM, w, h, rs,
        fs_mode="shipped", grid_n=grid_n)


def parity():
    g, w, h = 64, 320, 240
    xyuv, indices, heights = scene(g)
    views, projs = cams(1, w, h, 0.7)
    got = np.asarray(jax.device_get(packed(
        xyuv, indices, heights, views, projs, w, h, 2 * (g - 1),
        grid_n=g)))[0]
    records, bbox = P._terrain_records(
        xyuv, indices, heights, views[0], projs[0], COM[4], COM[5], w, h)
    cap, sx, sy = P._static_bin_params(bbox, w, h)
    ref = np.asarray(jax.device_get(P._terrain_render_from_records(
        records, bbox, heights, LUT, *COM, w, h, cap, sx, sy,
        fs_mode="shipped", use_pallas=False)))
    return np.array_equal(ref, got)


def main():
    knobs = {k: os.environ.get(k, "-") for k in
             ("VF_PACKED_MERGE", "VF_PACKED_SLAB", "VF_PACKED_ID")}
    ok = parity()
    xyuv, indices, heights = scene(GRID)
    rs = 2 * (GRID - 1)
    sets = [cams(B, W, H, 0.31 * r) for r in range(REPS + 1)]

    @jax.jit
    def run_sum(views, projs):
        # sum-forced: slicing the u32 image lets XLA prune the fragment
        # epilogue out of the measurement
        return jnp.sum(packed(xyuv, indices, heights, views, projs,
                              W, H, rs, grid_n=GRID) & 0xFF)

    def run(views, projs):
        return jax.device_get(run_sum(views, projs))

    run(*sets[-1])
    t0 = time.perf_counter()
    for r in range(REPS):
        run(*sets[r])
    dt = (time.perf_counter() - t0) / REPS
    print(f"knobs={knobs} grid={GRID} b{B} parity={'OK' if ok else 'FAIL'} "
          f"{dt*1e3:8.1f} ms/batch {W*H*B/dt/1e6:7.2f} Mpix/s", flush=True)


if __name__ == "__main__":
    main()

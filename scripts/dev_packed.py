#!/usr/bin/env python3
"""Packed-stream backend bring-up: byte-parity vs the jnp oracle, then
grid=1024 / grid=128 timings vs the round-2 paths. One script run batches
all compiles (tunnel compiles are 30-120 s each; see CLAUDE.md)."""
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


def cameras(n, aspect, phase=0.0, radius=3.0, eye_y=2.0):
    vs, ps = [], []
    for i in range(n):
        ang = 2 * math.pi * i / max(n, 1) + phase
        vs.append(look_at_rh((radius * math.cos(ang), eye_y,
                              radius * math.sin(ang)), (0, 0, 0), (0, 1, 0)))
        ps.append(perspective_wgpu(np.float32(math.radians(45.0)),
                                   np.float32(aspect), np.float32(0.1),
                                   np.float32(100.0)))
    return jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ps))


def scene(grid):
    xyuv_np, idx_np = _mesh.build_grid_xyuv(grid)
    return (jnp.asarray(xyuv_np),
            jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3)),
            jnp.zeros((1, 1), jnp.float32))


LUT = jnp.asarray(_colormap.build_lut("viridis")[0])
SUN = jnp.asarray(np.array([0.5, 1.0, 0.3], np.float32)
                  / np.linalg.norm([0.5, 1.0, 0.3]))
ARGS = dict(h_min=jnp.float32(-0.5), h_max=jnp.float32(0.5),
            exposure=jnp.float32(1.0), sun_dir=SUN,
            spacing=jnp.float32(1.0), exaggeration=jnp.float32(1.0))


def oracle_frame(xyuv, indices, heights, view, proj, w, h):
    records, bbox = P._terrain_records(
        xyuv, indices, heights, view, proj, ARGS["spacing"],
        ARGS["exaggeration"], w, h)
    cap, sx, sy = P._static_bin_params(bbox, w, h)
    return P._terrain_render_from_records(
        records, bbox, heights, LUT, ARGS["h_min"], ARGS["h_max"],
        ARGS["exposure"], ARGS["sun_dir"], ARGS["spacing"],
        ARGS["exaggeration"], w, h, cap, sx, sy, fs_mode="shipped",
        use_pallas=False)


def packed_batch(xyuv, indices, heights, views, projs, w, h, row_size):
    return P._terrain_render_batch_packed(
        xyuv, indices, heights, views, projs, LUT, ARGS["h_min"],
        ARGS["h_max"], ARGS["exposure"], ARGS["sun_dir"], ARGS["spacing"],
        ARGS["exaggeration"], w, h, row_size, fs_mode="shipped")


def strips_batch(xyuv, indices, heights, views, projs, w, h, row_size):
    return P._terrain_render_batch_strips(
        xyuv, indices, heights, views, projs, LUT, ARGS["h_min"],
        ARGS["h_max"], ARGS["exposure"], ARGS["sun_dir"], ARGS["spacing"],
        ARGS["exaggeration"], w, h, row_size, fs_mode="shipped")


def parity():
    ok = True
    for grid, w, h, cams in [
        (32, 160, 120, [(0.0, 3.0, 2.0), (1.0, 3.0, 2.0)]),
        (64, 320, 240, [(0.0, 3.0, 2.0),
                        (0.7, 0.9, 0.25),    # close-in: near-clip crossing
                        (2.1, 1.2, 0.18)]),  # adversarial low camera
    ]:
        xyuv, indices, heights = scene(grid)
        rs = 2 * (grid - 1)
        for (ph, rad, ey) in cams:
            views, projs = cameras(1, w / h, phase=ph, radius=rad, eye_y=ey)
            ref = np.asarray(jax.device_get(oracle_frame(
                xyuv, indices, heights, views[0], projs[0], w, h)))
            got = np.asarray(jax.device_get(packed_batch(
                xyuv, indices, heights, views, projs, w, h, rs)))[0]
            same = np.array_equal(ref, got)
            ndiff = int((ref != got).sum())
            print(f"parity grid={grid} {w}x{h} cam=({ph},{rad},{ey}): "
                  f"{'OK' if same else f'FAIL ({ndiff} px differ)'}")
            ok &= same
    return ok


def timeit(fn, cam_sets, reps):
    fn(*cam_sets[-1])  # compile
    t0 = time.perf_counter()
    for r in range(reps):
        fn(*cam_sets[r])
    return (time.perf_counter() - t0) / reps


def perf():
    reps = 3
    for grid, B in [(1024, 4), (128, 8)]:
        xyuv, indices, heights = scene(grid)
        rs = 2 * (grid - 1)
        cam_sets = [cameras(B, W / H, phase=0.31 * r) for r in range(reps + 1)]

        def run_packed(views, projs):
            out = packed_batch(xyuv, indices, heights, views, projs, W, H, rs)
            return jax.device_get(out[:, ::53, ::67])

        def run_strips(views, projs):
            out = strips_batch(xyuv, indices, heights, views, projs, W, H, rs)
            return jax.device_get(out[:, ::53, ::67])

        dt_p = timeit(run_packed, cam_sets, reps)
        dt_s = timeit(run_strips, cam_sets, reps)
        mp = W * H * B / 1e6
        print(f"grid={grid} b{B}: packed {dt_p*1e3:8.1f} ms/batch "
              f"({mp/dt_p:7.2f} Mpix/s) | strips {dt_s*1e3:8.1f} ms/batch "
              f"({mp/dt_s:7.2f} Mpix/s)")


if __name__ == "__main__":
    t0 = time.time()
    ok = parity()
    print(f"[parity done in {time.time()-t0:.0f}s] ok={ok}")
    if not ok and "--force" not in sys.argv:
        sys.exit(1)
    perf()

#!/usr/bin/env python3
"""Measure the BASELINE.md rows that mirror the reference's budget sheet
but were never recorded (VERDICT r3 items 4/6):

  phase dem   -- grid=1024 at 800x600 b4 with a REAL 2048^2 height
                 texture (one nearest sample per vertex in the VS);
                 mirrors SURVEY 7.8's real-DEM regime.
  phase 4k    -- 3840x2160 render at the flagship grid: render
                 throughput (checksum-forced) AND a separately-timed
                 full-frame readback, vs the reference's <200 ms GPU /
                 <60 ms readback budget (/root/reference/ROADMAP.md:1395).
  phase sweep -- grid=128 batch sweep b8/b16/b32: the fixed ~4.7 ms
                 dispatch overhead is ~35% of the b8 frame; bigger
                 batches amortize it (VERDICT r3 item 4 lever).

Usage: python scripts/dev_baseline_rows.py [dem|4k|sweep|all]
Each phase is bounded and independently runnable (dead-tunnel safe to
skip). Results print as one JSON line per measurement; paste into
BASELINE.md.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PHASE = sys.argv[1] if len(sys.argv) > 1 else "all"


def _scene(grid, dem_n=0):
    import jax.numpy as jnp
    from vulkan_forge import _colormap, _mesh
    xyuv_np, idx_np = _mesh.build_grid_xyuv(grid)
    if dem_n > 0:
        gy, gx = np.meshgrid(np.linspace(0, 6, dem_n, dtype=np.float32),
                             np.linspace(0, 6, dem_n, dtype=np.float32),
                             indexing="ij")
        heights = jnp.asarray((np.sin(gx) * np.cos(gy) * 0.25
                               ).astype(np.float32))
    else:
        heights = jnp.zeros((1, 1), jnp.float32)
    return (jnp.asarray(xyuv_np),
            jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3)),
            heights,
            jnp.asarray(_colormap.build_lut("viridis")[0]),
            jnp.asarray(np.array([0.5, 1, 0.3], np.float32)
                        / np.linalg.norm([0.5, 1, 0.3])))


def _cams(n, w, h, phase=0.0):
    import jax.numpy as jnp
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    vs, ps = [], []
    for i in range(n):
        ang = 2.0 * math.pi * i / max(n, 1) + phase
        vs.append(look_at_rh((3 * math.cos(ang), 2.0, 3 * math.sin(ang)),
                             (0, 0, 0), (0, 1, 0)))
        ps.append(perspective_wgpu(np.float32(math.radians(45)),
                                   np.float32(w / h), np.float32(0.1),
                                   np.float32(100)))
    return jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ps))


def _packed_run(grid, w, h, b, dem_n=0, reps=3):
    """(ms/frame checksum-forced, ms/frame full readback, Mpix/s)."""
    import jax
    import jax.numpy as jnp
    from vulkan_forge._raster import pipeline as P
    xyuv, indices, heights, lut, sun = _scene(grid, dem_n)
    use_pallas = P.backend_name() == "pallas"
    cam_sets = [_cams(b, w, h, 0.31 * r) for r in range(reps + 1)]

    @jax.jit
    def frames(views, projs):
        return P._terrain_render_batch_packed.__wrapped__(
            xyuv, indices, heights, views, projs, lut, jnp.float32(-0.5),
            jnp.float32(0.5), jnp.float32(1.0), sun, jnp.float32(1.0),
            jnp.float32(1.0), w, h, 2 * (grid - 1), fs_mode="shipped",
            use_pallas=use_pallas, grid_n=grid)

    @jax.jit
    def checksum(views, projs):
        return jnp.sum(frames(views, projs) & 0xFF)

    jax.device_get(checksum(*cam_sets[-1]))  # compile
    t0 = time.perf_counter()
    for r in range(reps):
        jax.device_get(checksum(*cam_sets[r]))
    render_ms = (time.perf_counter() - t0) / reps / b * 1000

    imgs = frames(*cam_sets[-1])
    jax.device_get(jnp.sum(imgs & 0xFF))  # materialize before timing
    t0 = time.perf_counter()
    for r in range(reps):
        imgs = frames(*cam_sets[r])
        jax.device_get(imgs)              # full readback through the host
    readback_ms = (time.perf_counter() - t0) / reps / b * 1000
    return render_ms, readback_ms, w * h * b / (render_ms * b / 1000) / 1e6


def phase_dem():
    render_ms, readback_ms, mpix = _packed_run(1024, 800, 600, 4, dem_n=2048)
    print(json.dumps({"row": "dem2048_grid1024_800x600_b4",
                      "render_ms_per_frame": round(render_ms, 1),
                      "full_roundtrip_ms_per_frame": round(readback_ms, 1),
                      "mpix_s": round(mpix, 2)}))


def phase_4k():
    render_ms, readback_ms, mpix = _packed_run(1024, 3840, 2160, 2, reps=2)
    print(json.dumps({"row": "4k_grid1024_3840x2160_b2",
                      "render_ms_per_frame": round(render_ms, 1),
                      "full_roundtrip_ms_per_frame": round(readback_ms, 1),
                      "readback_only_ms": round(readback_ms - render_ms, 1),
                      "mpix_s": round(mpix, 2),
                      "budget": "<200 ms render / <60 ms readback "
                                "(ROADMAP.md:1395)"}))


def phase_sweep():
    for b in (8, 16, 32):
        render_ms, _rb, mpix = _packed_run(128, 800, 600, b, reps=3)
        print(json.dumps({"row": f"grid128_800x600_b{b}_packed",
                          "render_ms_per_frame": round(render_ms, 1),
                          "mpix_s": round(mpix, 2),
                          "vs_21mpix_budget": round(mpix / 21.0, 2)}))


def main():
    phases = {"dem": phase_dem, "4k": phase_4k, "sweep": phase_sweep}
    if PHASE == "all":
        for fn in phases.values():
            fn()
    elif PHASE in phases:
        phases[PHASE]()
    else:
        print(f"unknown phase {PHASE}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())

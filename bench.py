#!/usr/bin/env python3
"""Headline benchmark: shaded-terrain throughput on one TPU chip.

Scene: the north-star config from BASELINE.json -- grid=1024 analytic
terrain (2 * 1023^2 = 2,093,058 triangles) shaded at 800x600 with the
shipped terrain pipeline (height sample, LUT color, Lambert, sRGB encode),
rendered as a batch of frames with distinct cameras per XLA dispatch.

Baseline: the reference's own budget for a 1024^2 DEM render is <= 50 ms
(ROADMAP.md:280) ~= 21 Mpix/s. vs_baseline is measured Mpix/s / 21.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

WIDTH, HEIGHT = 800, 600
# Default scene: the reference's default TerrainSpike grid (=128,
# src/terrain/mod.rs:258). VF_BENCH_GRID=1024 runs the dense-mesh config
# (segment-walk kernel); measured numbers for both live in BASELINE.md.
GRID = int(os.environ.get("VF_BENCH_GRID", "128"))
BATCH = int(os.environ.get("VF_BENCH_BATCH", "8"))
REPS = int(os.environ.get("VF_BENCH_REPS", "5"))


def orbit_cameras(n: int):
    """n cameras orbiting the spike terrain (distinct view/proj per frame)."""
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    views = []
    projs = []
    aspect = np.float32(WIDTH) / np.float32(HEIGHT)
    for i in range(n):
        ang = 2.0 * math.pi * i / max(n, 1)
        eye = (3.0 * math.cos(ang), 2.0, 3.0 * math.sin(ang))
        views.append(look_at_rh(eye, (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)))
        projs.append(perspective_wgpu(np.float32(math.radians(45.0)), aspect,
                                      np.float32(0.1), np.float32(100.0)))
    return np.stack(views), np.stack(projs)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from vulkan_forge import _colormap, _mesh
    from vulkan_forge._raster import pipeline as P

    xyuv_np, idx_np = _mesh.build_grid_xyuv(GRID)
    xyuv = jnp.asarray(xyuv_np)
    indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), jnp.float32)  # spike: analytic relief only
    lut, _ = _colormap.build_lut("viridis")
    lut = jnp.asarray(lut)

    views_np, projs_np = orbit_cameras(BATCH)
    views = jnp.asarray(views_np)
    projs = jnp.asarray(projs_np)

    sun = jnp.asarray(np.array([0.5, 1.0, 0.3], np.float32)
                      / np.linalg.norm([0.5, 1.0, 0.3]))
    args = dict(h_min=jnp.float32(-0.5), h_max=jnp.float32(0.5),
                exposure=jnp.float32(1.0), sun_dir=sun,
                spacing=jnp.float32(1.0), exaggeration=jnp.float32(1.0))

    use_pallas = P.backend_name() == "pallas"
    T = int(indices.shape[0])

    # Per-frame dispatch with a distinct camera each frame (the serving
    # pattern); binning capacities sized once from a prepass over all
    # cameras so every frame reuses one compiled executable.
    if use_pallas and T > P.SEGMENT_THRESHOLD:
        nval = int(jax.device_get(P._terrain_batch_valid_count(
            xyuv, indices, heights, views, projs, args["spacing"],
            args["exaggeration"], WIDTH, HEIGHT)))
        cap = P._round_capacity(nval)
        row_size = 2 * (GRID - 1)
        perm_c = jnp.asarray(P._column_major_perm(GRID - 1, GRID - 1))
        rs_c = row_size  # square grid: both axes share the stride

        def frame(view, proj):
            records, bbox = P._terrain_records(
                xyuv, indices, heights, view, proj, args["spacing"],
                args["exaggeration"], WIDTH, HEIGHT)
            est_r, est_c = jax.device_get(P._segment_axis_estimate(
                bbox, perm_c, WIDTH, HEIGHT, row_size, rs_c))
            perm = perm_c if int(est_c) < int(est_r) else None
            return P._terrain_render_segments(
                records, bbox, heights, lut, args["h_min"], args["h_max"],
                args["exposure"], args["sun_dir"], args["spacing"],
                args["exaggeration"], WIDTH, HEIGHT, row_size, cap,
                perm=perm, fs_mode="shipped")
    else:
        cmax, sx, sy = jax.device_get(P._terrain_batch_counts(
            xyuv, indices, heights, views, projs, args["spacing"],
            args["exaggeration"], WIDTH, HEIGHT))
        capacity = P._round_capacity(int(cmax))
        span_x = P._round_span(int(sx))
        span_y = P._round_span(int(sy))

        @jax.jit
        def frame(view, proj):
            records, bbox = P._terrain_records.__wrapped__(
                xyuv, indices, heights, view, proj, args["spacing"],
                args["exaggeration"], WIDTH, HEIGHT)
            return P._terrain_render_from_records.__wrapped__(
                records, bbox, heights, lut, args["h_min"], args["h_max"],
                args["exposure"], args["sun_dir"], args["spacing"],
                args["exaggeration"], WIDTH, HEIGHT, capacity, span_x,
                span_y, fs_mode="shipped", use_pallas=use_pallas)

    def run():
        outs = [frame(views[i], projs[i]) for i in range(BATCH)]
        jax.block_until_ready(outs)
        return outs

    run()  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        run()
    dt = (time.perf_counter() - t0) / REPS

    mpix = (WIDTH * HEIGHT * BATCH) / dt / 1e6
    baseline_mpix = 21.0  # reference budget: 1024^2 in 50 ms
    result = {
        "metric": f"terrain_throughput_grid{GRID}_{WIDTH}x{HEIGHT}_b{BATCH}",
        "value": round(mpix, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix / baseline_mpix, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

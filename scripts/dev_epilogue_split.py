#!/usr/bin/env python3
"""Fragment-epilogue split experiment for the batched packed path
(docs/NEXT.md queue item 5: the single-frame list path measured a 30x
XLA mis-fusion when a gather/transcendental epilogue shares a jit with a
pallas call; the batched paths fuse today and were never measured).

Measures, at the given config, frames/s of:
  fused  -- the shipped _terrain_render_batch_packed (gbuffer + FS in
            one jit), checksum-forced.
  split  -- jit #1: packed gbuffer planes only; jit #2: the FS epilogue.
            Same math, one extra HBM materialization of the 4 planes.

Usage: python scripts/dev_epilogue_split.py [grid] [W] [H] [B] [reps]
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
W = int(sys.argv[2]) if len(sys.argv) > 2 else 800
H = int(sys.argv[3]) if len(sys.argv) > 3 else 600
B = int(sys.argv[4]) if len(sys.argv) > 4 else 4
REPS = int(sys.argv[5]) if len(sys.argv) > 5 else 4


def main():
    import jax
    import jax.numpy as jnp
    from vulkan_forge import _colormap, _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    from vulkan_forge._raster import fragment, packed
    from vulkan_forge._raster import pipeline as P

    use_pallas = P.backend_name() == "pallas"
    xyuv_np, idx_np = _mesh.build_grid_xyuv(GRID)
    xyuv = jnp.asarray(xyuv_np)
    indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), jnp.float32)
    lut = jnp.asarray(_colormap.build_lut("viridis")[0])
    sun = jnp.asarray(np.array([0.5, 1, 0.3], np.float32)
                      / np.linalg.norm([0.5, 1, 0.3]))
    h_min, h_max = jnp.float32(-0.5), jnp.float32(0.5)

    def cams(phase):
        vs, ps = [], []
        for i in range(B):
            ang = 2.0 * math.pi * i / B + phase
            vs.append(look_at_rh((3 * math.cos(ang), 2.0, 3 * math.sin(ang)),
                                 (0, 0, 0), (0, 1, 0)))
            ps.append(perspective_wgpu(np.float32(math.radians(45)),
                                       np.float32(W / H), np.float32(0.1),
                                       np.float32(100)))
        return jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ps))

    cam_sets = [cams(0.31 * r) for r in range(REPS + 1)]
    row_size = 2 * (GRID - 1)

    @jax.jit
    def fused(views, projs):
        out = P._terrain_render_batch_packed.__wrapped__(
            xyuv, indices, heights, views, projs, lut, h_min, h_max,
            jnp.float32(1.0), sun, jnp.float32(1.0), jnp.float32(1.0),
            W, H, row_size, fs_mode="shipped", use_pallas=use_pallas,
            grid_n=GRID)
        return jnp.sum(out & 0xFF)

    # split: gbuffer jit reproduces _terrain_render_batch_packed's body
    # up to (and excluding) the FS vmap; the FS jit is the epilogue alone.
    @jax.jit
    def gbuffer(views, projs):
        def prep(view, proj):
            return P._terrain_cols(xyuv, indices, heights, view, proj,
                                   jnp.float32(1.0), jnp.float32(1.0),
                                   W, H, "shipped", grid_n=GRID)

        cols_b, bbox_b = jax.vmap(prep)(views, projs)
        if P._grid_split_ok(GRID, indices):
            from vulkan_forge._raster.setup import grid_split_ids
            eff_row_size, tri_ids = grid_split_ids(GRID)
            id_stride = 2
        else:
            eff_row_size, tri_ids, id_stride = row_size, None, 1
        if use_pallas:
            return packed.render_gbuffer_packed_batch(
                cols_b, bbox_b, eff_row_size, W, H,
                tri_ids=tri_ids, id_stride=id_stride)
        return jax.vmap(
            lambda cb, bb: packed.render_gbuffer_packed_ref(
                cb, bb, eff_row_size, W, H,
                tri_ids=tri_ids, id_stride=id_stride))(cols_b, bbox_b)

    @jax.jit
    def fs_epilogue(v0, v1, v2, mask):
        out = jax.vmap(
            lambda a, b, c, m: fragment.terrain_fs(
                a, b, c, m, lut, h_max - h_min, jnp.float32(1.0), sun)
        )(v0, v1, v2, mask)
        return jnp.sum(out & 0xFF)

    def run_fused(views, projs):
        return jax.device_get(fused(views, projs))

    def run_split(views, projs):
        return jax.device_get(fs_epilogue(*gbuffer(views, projs)))

    results = {}
    for name, run in (("fused", run_fused), ("split", run_split)):
        s0 = run(*cam_sets[-1])  # compile
        t0 = time.perf_counter()
        for r in range(REPS):
            s = run(*cam_sets[r])
        dt = (time.perf_counter() - t0) / REPS
        mpix = W * H * B / dt / 1e6
        results[name] = mpix
        print(f"{name}: {dt * 1000 / B:.1f} ms/frame  {mpix:.2f} Mpix/s "
              f"(checksum {int(s)})")
    print(f"split/fused speedup: {results['split'] / results['fused']:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())

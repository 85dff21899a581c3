#!/usr/bin/env python3
"""vtx kernel bring-up: byte-parity vs the tile oracle on spike scenes.

Usage: python scripts/dev_vtx.py [grid] [W] [H] [slots] [B]
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

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 12
W = int(sys.argv[2]) if len(sys.argv) > 2 else 96
H = int(sys.argv[3]) if len(sys.argv) > 3 else 64
SLOTS = int(sys.argv[4]) if len(sys.argv) > 4 else 16
B = int(sys.argv[5]) if len(sys.argv) > 5 else 1


def spike(grid, W, H, eye=(3.0, 2.0, 3.0)):
    from vulkan_forge import _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    from vulkan_forge._raster import transform
    from vulkan_forge._raster.setup import clip_to_fb

    xyuv_np, idx_np = _mesh.build_grid_xyuv(grid)
    xyuv = jnp.asarray(xyuv_np)
    indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), jnp.float32)
    view = jnp.asarray(look_at_rh(eye, (0, 0, 0), (0, 1, 0)))
    proj = jnp.asarray(perspective_wgpu(
        np.float32(math.radians(45.0)), np.float32(W / H),
        np.float32(0.1), np.float32(100.0)))
    clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                      jnp.float32(1.0), jnp.float32(1.0))
    x, y, z, w = clip_to_fb(clip, W, H)
    return x, y, z, w, vary, indices


def oracle(x, y, z, w, vary, indices, W, H):
    from vulkan_forge._raster import tiles
    from vulkan_forge._raster.setup import (bin_triangles, tile_counts,
                                            tile_span_max, triangle_setup)
    records, bbox = triangle_setup(x, y, z, w, vary, indices, W, H)
    cap = int(tile_counts(bbox, W, H).max())
    sx, sy = tile_span_max(bbox, W, H)
    binning = bin_triangles(bbox, W, H, max(cap, 8),
                            span_x=int(sx), span_y=int(sy))
    return tiles.render_gbuffer(records, binning.tile_lists, W, H)


def main():
    from vulkan_forge._raster import vtx

    x, y, z, w, vary, indices = spike(GRID, W, H)
    ref = oracle(x, y, z, w, vary, indices, W, H)

    zero = jnp.zeros_like(x)
    fields = (x, y, w, vary[:, 0], vary[:, 1], vary[:, 2], z, zero)
    fields_b = tuple(jnp.broadcast_to(f, (B,) + f.shape) for f in fields)

    t0 = time.perf_counter()
    (v0, v1, v2, m), needed = vtx.render_gbuffer_vtx_batch(
        fields_b, GRID, W, H, slots=SLOTS)
    got = jax.device_get((v0, v1, v2, m, needed))
    print(f"first run (incl compile): {time.perf_counter() - t0:.1f}s")
    v0, v1, v2, m, needed = got
    print(f"needed slots: {needed} (slots={SLOTS}) "
          f"{'OVERFLOW' if needed > SLOTS else 'ok'}")

    names = ("v0", "v1", "v2", "mask")
    ok = True
    for name, a, b in zip(names, ref, (v0[0], v1[0], v2[0], m[0])):
        a = np.asarray(a)
        b = np.asarray(b)
        if a.dtype == np.bool_:
            diff = int((a != b).sum())
            print(f"{name}: coverage diffs = {diff}")
            ok &= diff == 0
        else:
            same = np.array_equal(a, b)
            md = float(np.abs(a - b).max()) if a.shape == b.shape else -1
            print(f"{name}: byte-equal={same} maxdiff={md:.3e}")
            ok &= same
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

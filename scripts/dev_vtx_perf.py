#!/usr/bin/env python3
"""vtx kernel perf at the north-star config (grid=1024, 800x600).

Times the full vtx gbuffer path (VS + stream build + kernel) with varying
cameras per rep (memoization trap) and sum-forced device_get (pallas
block_until_ready trap). Usage:

  python scripts/dev_vtx_perf.py [grid] [W] [H] [slots] [B] [reps]
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

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
W = int(sys.argv[2]) if len(sys.argv) > 2 else 800
H = int(sys.argv[3]) if len(sys.argv) > 3 else 600
SLOTS = int(sys.argv[4]) if len(sys.argv) > 4 else 4
B = int(sys.argv[5]) if len(sys.argv) > 5 else 4
REPS = int(sys.argv[6]) if len(sys.argv) > 6 else 6


def main():
    from vulkan_forge import _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    from vulkan_forge._raster import transform, vtx
    from vulkan_forge._raster.setup import clip_to_fb

    xyuv_np, _idx = _mesh.build_grid_xyuv(GRID)
    xyuv = jnp.asarray(xyuv_np)
    heights = jnp.zeros((1, 1), jnp.float32)
    proj = jnp.asarray(perspective_wgpu(
        np.float32(math.radians(45.0)), np.float32(W / H),
        np.float32(0.1), np.float32(100.0)))

    def views_for(seed):
        vs = []
        for i in range(B):
            a = 0.4 + 0.13 * seed + 0.31 * i
            eye = (3.0 * math.cos(a), 2.0 + 0.01 * i, 3.0 * math.sin(a))
            vs.append(look_at_rh(eye, (0, 0, 0), (0, 1, 0)))
        return jnp.asarray(np.stack(vs))

    @jax.jit
    def frame(views):
        def one(view):
            clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                              jnp.float32(1.0),
                                              jnp.float32(1.0))
            x, y, z, w = clip_to_fb(clip, W, H)
            zero = jnp.zeros_like(x)
            return (x, y, w, vary[:, 0], vary[:, 1], vary[:, 2], z, zero)

        fields_b = jax.vmap(one)(views)
        (v0, v1, v2, m), needed = vtx.render_gbuffer_vtx_batch(
            fields_b, GRID, W, H, slots=SLOTS)
        return (jnp.sum(v0), jnp.sum(v1), jnp.sum(v2), jnp.sum(m),
                needed)

    t0 = time.perf_counter()
    out = jax.device_get(frame(views_for(0)))
    print(f"first run (incl compile): {time.perf_counter() - t0:.1f}s "
          f"needed={out[4]} (slots={SLOTS})")

    times = []
    for r in range(1, REPS + 1):
        v = views_for(r)
        t0 = time.perf_counter()
        out = jax.device_get(frame(v))
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1000.0 / B
    mpix = W * H / (ms * 1e-3) / 1e6
    print(f"best of {REPS}: {ms:.1f} ms/frame  {mpix:.2f} Mpix/s  "
          f"(B={B}, needed={out[4]})")
    print(f"all reps (ms/frame): "
          + " ".join(f"{t * 1000 / B:.1f}" for t in times))


if __name__ == "__main__":
    main()

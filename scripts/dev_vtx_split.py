#!/usr/bin/env python3
"""Fragment-epilogue split experiment for the VTX path (NEXT.md item 5).

bench.py measured the fused vtx executable (gbuffer pallas call + FS
epilogue in ONE jit) at ~126 ms/frame while dev_vtx_perf measures the
gbuffer alone at ~91 ms -- if the ~35 ms delta is the known XLA
mis-fusion around pallas calls (NEXT.md round-3 trap: up to 30x on the
list path) rather than honest FS cost, splitting the FS into its own
executable should recover most of it.

Measures, at the given config, ms/frame of:
  fused -- pipeline._terrain_render_batch_vtx (gbuffer + FS, one jit).
  split -- jit #1: vtx gbuffer planes only; jit #2: FS epilogue.

Usage: python scripts/dev_vtx_split.py [grid] [W] [H] [slots] [B] [reps]
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
SLOTS = int(sys.argv[4]) if len(sys.argv) > 4 else 8
B = int(sys.argv[5]) if len(sys.argv) > 5 else 4
REPS = int(sys.argv[6]) if len(sys.argv) > 6 else 6


def main():
    import jax
    import jax.numpy as jnp
    from vulkan_forge import _colormap, _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    from vulkan_forge._raster import fragment, transform, vtx
    from vulkan_forge._raster import pipeline as P
    from vulkan_forge._raster.setup import clip_to_fb

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

    def fused(views, projs):
        imgs, needed = P._terrain_render_batch_vtx(
            xyuv, indices, heights, views, projs, lut, h_min, h_max,
            jnp.float32(1.0), sun, jnp.float32(1.0), jnp.float32(1.0),
            W, H, fs_mode="shipped", grid_n=GRID, slots=SLOTS)
        return jax.device_get((jnp.sum(imgs & 0xFF), needed))

    base = 4 if GRID >= 512 else SLOTS

    # Returning the raw g-buffer planes from this jit does NOT hit the
    # scoped-VMEM staging OOM that dev_vtx_variants.py documents: the
    # planes here are EXECUTABLE OUTPUTS consumed by a SECOND jit
    # (fs_epilogue below), so XLA places them in HBM; the variants script
    # returned them from the same jit that also reduced them, which let
    # the staging pass keep the pallas outputs scoped (20.65M vs 16M at
    # grid=1024). Measured working on hardware round 4 (BASELINE.md
    # split-FS row).
    @jax.jit
    def gbuffer(views, projs):
        def one(view, proj):
            clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                              jnp.float32(1.0),
                                              jnp.float32(1.0))
            x, y, z, w = clip_to_fb(clip, W, H)
            zero = jnp.zeros_like(x)
            return (x, y, w, vary[:, 0], vary[:, 1], vary[:, 2], z, zero)

        fields_b = jax.vmap(one)(views, projs)
        return vtx.render_gbuffer_vtx_batch(fields_b, GRID, W, H,
                                            slots=SLOTS, base_slots=base)

    @jax.jit
    def fs_epilogue(v0, v1, v2, mask):
        imgs = jax.vmap(
            lambda a, b, c, m: fragment.terrain_fs(
                a, b, c, m, lut, h_max - h_min, jnp.float32(1.0), sun)
        )(v0, v1, v2, mask)
        return jnp.sum(imgs & 0xFF)

    def split(views, projs):
        (v0, v1, v2, mask), needed = gbuffer(views, projs)
        return jax.device_get((fs_epilogue(v0, v1, v2, mask), needed))

    for name, fn in (("fused", fused), ("split", split)):
        t0 = time.perf_counter()
        out = fn(*cam_sets[-1])
        print(f"{name}: first run (incl compile) {time.perf_counter()-t0:.1f}s"
              f" needed={float(out[1])}", flush=True)
        times = []
        for r in range(REPS):
            t0 = time.perf_counter()
            out = fn(*cam_sets[r])
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1000.0 / B
        mpix = W * H / (ms * 1e-3) / 1e6
        allr = " ".join(f"{t*1000/B:.1f}" for t in times)
        print(f"{name}: best of {REPS}: {ms:.1f} ms/frame  {mpix:.2f} Mpix/s"
              f"  (reps: {allr})", flush=True)


if __name__ == "__main__":
    main()

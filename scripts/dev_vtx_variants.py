#!/usr/bin/env python3
"""Byte-identity check of the VF_VTX_VARIANT trip bodies (docs/NEXT.md
round-3d experiment queue) against the shipped variant, plus -- on real
hardware -- a timed bake-off. Usage:
    python scripts/dev_vtx_variants.py [grid] [W] [H] [slots] [B] [reps]
CPU: runs under VF_VTX_INTERPRET=1 automatically (identity only).
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 48
W = int(sys.argv[2]) if len(sys.argv) > 2 else 96
H = int(sys.argv[3]) if len(sys.argv) > 3 else 64
SLOTS = int(sys.argv[4]) if len(sys.argv) > 4 else 6
B = int(sys.argv[5]) if len(sys.argv) > 5 else 1
REPS = int(sys.argv[6]) if len(sys.argv) > 6 else 0

VARIANTS = ("", "recompute_p", "fcache", "concat_lhs")


def main():
    import jax
    import jax.numpy as jnp
    from vulkan_forge import _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    from vulkan_forge._raster import transform, vtx
    from vulkan_forge._raster.setup import clip_to_fb

    if jax.devices()[0].platform == "cpu":
        os.environ.setdefault("VF_VTX_INTERPRET", "1")
        print("CPU: interpret mode, identity check only")

    xyuv_np, idx_np = _mesh.build_grid_xyuv(GRID)
    xyuv = jnp.asarray(xyuv_np)
    heights = jnp.zeros((1, 1), jnp.float32)
    view = jnp.asarray(look_at_rh((3.0, 2.0, 3.0), (0, 0, 0), (0, 1, 0)))
    proj = jnp.asarray(perspective_wgpu(
        np.float32(math.radians(45.0)), np.float32(W / H),
        np.float32(0.1), np.float32(100.0)))
    clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                      jnp.float32(1.0), jnp.float32(1.0))
    x, y, z, w = clip_to_fb(clip, W, H)
    zero = jnp.zeros_like(x)
    fields = (x, y, w, vary[:, 0], vary[:, 1], vary[:, 2], z, zero)
    fields_b = tuple(jnp.broadcast_to(f, (B,) + f.shape) for f in fields)

    results = {}
    for v in VARIANTS:
        os.environ["VF_VTX_VARIANT"] = v
        t0 = time.perf_counter()
        (v0, v1, v2, m), needed = vtx.render_gbuffer_vtx_batch(
            fields_b, GRID, W, H, slots=SLOTS)
        got = jax.device_get((v0, v1, v2, m, needed))
        dt0 = time.perf_counter() - t0
        print(f"[{v or 'shipped'}] first run (incl compile): {dt0:.1f}s "
              f"needed={float(got[4])}")
        if REPS:
            t0 = time.perf_counter()
            for _ in range(REPS):
                (v0, v1, v2, m), needed = vtx.render_gbuffer_vtx_batch(
                    fields_b, GRID, W, H, slots=SLOTS)
                jax.device_get(jnp.sum(v0) + jnp.sum(m))
            dt = (time.perf_counter() - t0) / REPS / B * 1000
            print(f"[{v or 'shipped'}] {dt:.1f} ms/frame over {REPS} reps")
        results[v] = got

    ref = results[""]
    ok = True
    for v in VARIANTS[1:]:
        got = results[v]
        for name, a, b in zip(("v0", "v1", "v2", "mask", "needed"),
                              ref, got):
            same = np.array_equal(np.asarray(a), np.asarray(b))
            ok &= same
            if not same:
                print(f"[{v}] {name}: MISMATCH")
        print(f"[{v}] byte-identical to shipped: "
              f"{all(np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(ref, got))}")
    print("VARIANTS OK" if ok else "VARIANTS FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

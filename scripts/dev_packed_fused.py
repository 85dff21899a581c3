#!/usr/bin/env python3
"""Resident-stream fused packed kernel bring-up: byte-parity of
render_image_packed_resident_fused_batch against the shipped split path
(slab-ring gbuffer kernel + XLA fragment.terrain_fs), plus a timed
comparison on hardware.

Usage: python scripts/dev_packed_fused.py [grid] [W] [H] [B] [reps]

On TPU both paths must be BYTE-IDENTICAL (scripts/exp_fs_ops.py op
evidence). On CPU (interpret mode) the comparison allows 1 u8 step
(XLA:CPU may fuse 1/sqrt differently from lax.rsqrt).
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 33
W = int(sys.argv[2]) if len(sys.argv) > 2 else 117
H = int(sys.argv[3]) if len(sys.argv) > 3 else 83
B = int(sys.argv[4]) if len(sys.argv) > 4 else 2
REPS = int(sys.argv[5]) if len(sys.argv) > 5 else 0


def main():
    import jax
    import jax.numpy as jnp
    from vulkan_forge import _colormap, _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    from vulkan_forge._raster import fragment, packed as pk, transform
    from vulkan_forge._raster.setup import clip_to_fb, setup_cols

    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu:
        os.environ.setdefault("VF_PACKED_INTERPRET", "1")
        print("CPU: interpret mode, tolerance 1 u8 step")

    xyuv_np, idx_np = _mesh.build_grid_xyuv(GRID)
    xyuv = jnp.asarray(xyuv_np)
    indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), jnp.float32)
    RS = 2 * (GRID - 1)
    T = int(indices.shape[0])
    assert pk.resident_fused_ok(T, W, H, RS), "config outside resident gate"

    lut, _fmt = _colormap.build_lut("terrain")
    lut = jnp.asarray(lut)
    h_range = jnp.float32(1.0)
    exposure = jnp.float32(1.1)
    sun = jnp.asarray([0.35, 0.9, 0.2], jnp.float32)

    def cams(phase):
        vs, ps = [], []
        for i in range(B):
            a = 2 * math.pi * i / B + phase
            vs.append(look_at_rh((3 * math.cos(a), 2.0, 3 * math.sin(a)),
                                 (0, 0, 0), (0, 1, 0)))
            ps.append(perspective_wgpu(np.float32(math.radians(45)),
                                       np.float32(W / H), np.float32(0.1),
                                       np.float32(100)))
        return jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ps))

    def prep(views, projs):
        def one(view, proj):
            clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                              jnp.float32(1.0),
                                              jnp.float32(1.0))
            x, y, z, w = clip_to_fb(clip, W, H)
            return setup_cols(x, y, z, w, vary, indices, W, H)
        return jax.vmap(one)(views, projs)

    @jax.jit
    def run_fused(views, projs):
        cols_b, bbox_b = prep(views, projs)
        return pk.render_image_packed_resident_fused_batch(
            tuple(cols_b), bbox_b, lut, h_range, exposure, sun, RS, W, H)

    @jax.jit
    def run_split(views, projs):
        cols_b, bbox_b = prep(views, projs)
        if on_cpu:   # the slab kernel has no interpret mode; jnp oracle
            v0, v1, v2, m = jax.vmap(
                lambda cb, bb: pk.render_gbuffer_packed_ref(
                    tuple(cb), bb, RS, W, H))(cols_b, bbox_b)
        else:
            v0, v1, v2, m = pk.render_gbuffer_packed_batch(
                tuple(cols_b), bbox_b, RS, W, H)
        return jax.vmap(
            lambda a, b, c, mk: fragment.terrain_fs(
                a, b, c, mk, lut, h_range, exposure, sun))(v0, v1, v2, m)

    cam0 = cams(0.4)
    t0 = time.perf_counter()
    img_f = jax.device_get(run_fused(*cam0))
    print(f"fused first run (incl compile): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    img_s = jax.device_get(run_split(*cam0))
    print(f"split first run (incl compile): {time.perf_counter() - t0:.1f}s")

    a8 = (np.ascontiguousarray(img_f).view(np.uint8)
          .reshape(B, H, W, 4).astype(np.int32))
    b8 = (np.ascontiguousarray(img_s).view(np.uint8)
          .reshape(B, H, W, 4).astype(np.int32))
    d = np.abs(a8 - b8)
    exact = int((d != 0).sum())
    print(f"byte diffs: {exact} / {d.size}  max={int(d.max())}")
    # Documented FS bit-parity policy (BASELINE.md round 5): kernel-FS
    # vs XLA-FS images agree to <= 1 u8 step on <= 1e-4 of bytes (XLA
    # reassociates/FMA-contracts the plane-shaped FS; root-caused, not
    # a kernel bug). G-buffer exactness is pinned separately by
    # tests/test_resident.py.
    ok = int(d.max()) <= 1 and exact <= d.size * 1e-4
    print("RESIDENT FUSED PARITY OK" if ok else "RESIDENT FUSED PARITY FAIL")

    if REPS:
        # Distinct cameras per timed rep (identical dispatches memoize
        # upstream); cam0 above is the warm set and is never timed.
        rep_cams = [cams(0.4 + 0.13 * (r + 1)) for r in range(REPS)]
        for name, fn in (("res-fused", run_fused), ("split", run_split)):
            times = []
            for cs in rep_cams:
                t0 = time.perf_counter()
                img = fn(*cs)
                jax.device_get(jnp.sum(img & jnp.uint32(0xFF)))
                times.append(time.perf_counter() - t0)
            best = min(times) / B * 1000
            print(f"[{name}] {best:.2f} ms/frame best-of-{REPS} "
                  f"(all: {' '.join(f'{t / B * 1000:.2f}' for t in times)})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

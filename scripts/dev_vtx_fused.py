#!/usr/bin/env python3
"""Fused-FS vtx kernel bring-up: byte-parity of render_image_vtx_batch
against the split path (gbuffer kernel + XLA fragment.terrain_fs), plus a
timed comparison on hardware.

Usage: python scripts/dev_vtx_fused.py [grid] [W] [H] [slots] [B] [reps]

On TPU both paths must be BYTE-IDENTICAL (every fused op is bit-exact vs
its XLA lowering, scripts/exp_fs_ops.py). On CPU (interpret mode) the
comparison allows 1 u8 step: XLA:CPU may fuse 1/sqrt differently from
lax.rsqrt, an ulp that survives quantization only on shade boundaries.
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 12
W = int(sys.argv[2]) if len(sys.argv) > 2 else 96
H = int(sys.argv[3]) if len(sys.argv) > 3 else 64
SLOTS = int(sys.argv[4]) if len(sys.argv) > 4 else 16
B = int(sys.argv[5]) if len(sys.argv) > 5 else 1
REPS = int(sys.argv[6]) if len(sys.argv) > 6 else 0


def main():
    import jax
    import jax.numpy as jnp
    from vulkan_forge import _colormap, _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    from vulkan_forge._raster import fragment, transform, vtx
    from vulkan_forge._raster.setup import clip_to_fb

    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu:
        os.environ.setdefault("VF_VTX_INTERPRET", "1")
        print("CPU: interpret mode, tolerance 1 u8 step")

    xyuv_np, _idx = _mesh.build_grid_xyuv(GRID)
    xyuv = jnp.asarray(xyuv_np)
    heights = jnp.zeros((1, 1), jnp.float32)
    proj = jnp.asarray(perspective_wgpu(
        np.float32(math.radians(45.0)), np.float32(W / H),
        np.float32(0.1), np.float32(100.0)))

    def fields_for(eye):
        view = jnp.asarray(look_at_rh(eye, (0, 0, 0), (0, 1, 0)))
        clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                          jnp.float32(1.0), jnp.float32(1.0))
        x, y, z, w = clip_to_fb(clip, W, H)
        zero = jnp.zeros_like(x)
        fields = (x, y, w, vary[:, 0], vary[:, 1], vary[:, 2], z, zero)
        return tuple(jnp.broadcast_to(f, (B,) + f.shape) for f in fields)

    lut, _fmt = _colormap.build_lut("terrain")
    lut = jnp.asarray(lut)
    h_range = jnp.float32(1.0)
    exposure = jnp.float32(1.1)
    sun = jnp.asarray([0.35, 0.9, 0.2], jnp.float32)

    @jax.jit
    def run_fused(fb):
        return vtx.render_image_vtx_batch(fb, lut, h_range, exposure, sun,
                                          GRID, W, H, slots=SLOTS)

    @jax.jit
    def run_split(fb):
        (v0, v1, v2, m), needed = vtx.render_gbuffer_vtx_batch(
            fb, GRID, W, H, slots=SLOTS)
        imgs = jax.vmap(
            lambda a, b, c, mk: fragment.terrain_fs(
                a, b, c, mk, lut, h_range, exposure, sun))(v0, v1, v2, m)
        return imgs, needed

    fields_b = fields_for((3.0, 2.0, 3.0))
    t0 = time.perf_counter()
    img_f, need_f = jax.device_get(run_fused(fields_b))
    print(f"fused first run (incl compile): {time.perf_counter() - t0:.1f}s "
          f"needed={float(need_f)}")
    t0 = time.perf_counter()
    img_s, need_s = jax.device_get(run_split(fields_b))
    print(f"split first run (incl compile): {time.perf_counter() - t0:.1f}s "
          f"needed={float(need_s)}")

    a8 = (np.ascontiguousarray(img_f).view(np.uint8)
          .reshape(B, H, W, 4).astype(np.int32))
    b8 = (np.ascontiguousarray(img_s).view(np.uint8)
          .reshape(B, H, W, 4).astype(np.int32))
    d = np.abs(a8 - b8)
    exact = int((d != 0).sum())
    print(f"byte diffs: {exact} / {d.size}  max={int(d.max())}")
    ok = exact == 0 if not on_cpu else int(d.max()) <= 1
    print("FUSED PARITY OK" if ok else "FUSED PARITY FAIL")

    if REPS:
        # Distinct camera per rep (identical dispatches memoize upstream).
        rep_fields = [fields_for((3.0 * math.cos(0.4 + 0.13 * r), 2.0,
                                  3.0 * math.sin(0.4 + 0.13 * r)))
                      for r in range(REPS)]
        for name, fn in (("fused", run_fused), ("split", run_split)):
            times = []
            for fb in rep_fields:
                t0 = time.perf_counter()
                img, _ = fn(fb)
                jax.device_get(jnp.sum(img & jnp.uint32(0xFF)))
                times.append(time.perf_counter() - t0)
            best = min(times) / B * 1000
            print(f"[{name}] {best:.1f} ms/frame best-of-{REPS} "
                  f"(all: {' '.join(f'{t / B * 1000:.1f}' for t in times)})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Localize the resident-fused vs split byte diffs: three-way compare
(resident fused, slab kernel + XLA FS, jnp ref walker + XLA FS) and dump
the g-buffer values at differing pixels.

Usage: python scripts/exp_resident_diff.py [grid] [W] [H] [B]
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 48
W = int(sys.argv[2]) if len(sys.argv) > 2 else 800
H = int(sys.argv[3]) if len(sys.argv) > 3 else 600
B = int(sys.argv[4]) if len(sys.argv) > 4 else 4


def main():
    import jax
    import jax.numpy as jnp
    from vulkan_forge import _colormap, _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    from vulkan_forge._raster import fragment, packed as pk, transform
    from vulkan_forge._raster.setup import clip_to_fb, setup_cols

    xyuv_np, idx_np = _mesh.build_grid_xyuv(GRID)
    xyuv = jnp.asarray(xyuv_np)
    indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), jnp.float32)
    RS = 2 * (GRID - 1)

    lut, _ = _colormap.build_lut("terrain")
    lut = jnp.asarray(lut)
    h_range = jnp.float32(1.0)
    exposure = jnp.float32(1.1)
    sun = jnp.asarray([0.35, 0.9, 0.2], jnp.float32)

    vs, ps = [], []
    for i in range(B):
        a = 2 * math.pi * i / B + 0.4
        vs.append(look_at_rh((3 * math.cos(a), 2.0, 3 * math.sin(a)),
                             (0, 0, 0), (0, 1, 0)))
        ps.append(perspective_wgpu(np.float32(math.radians(45)),
                                   np.float32(W / H), np.float32(0.1),
                                   np.float32(100)))
    views, projs = jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ps))

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
    def gb_split(views, projs):
        cols_b, bbox_b = prep(views, projs)
        return pk.render_gbuffer_packed_batch(tuple(cols_b), bbox_b, RS, W, H)

    @jax.jit
    def gb_oracle(views, projs):
        cols_b, bbox_b = prep(views, projs)
        return jax.vmap(
            lambda cb, bb: pk.render_gbuffer_packed_ref(
                tuple(cb), bb, RS, W, H))(cols_b, bbox_b)

    @jax.jit
    def fs(v0, v1, v2, m):
        return jax.vmap(
            lambda a, b, c, mk: fragment.terrain_fs(
                a, b, c, mk, lut, h_range, exposure, sun))(v0, v1, v2, m)

    img_f = np.ascontiguousarray(jax.device_get(run_fused(views, projs)))
    gs = jax.device_get(gb_split(views, projs))
    go = jax.device_get(gb_oracle(views, projs))
    img_s = np.ascontiguousarray(jax.device_get(fs(*gs)))
    img_o = np.ascontiguousarray(jax.device_get(fs(*go)))

    for name, a, b in (("split vs oracle gbuf", gs, go),):
        for k, (x, y) in enumerate(zip(a, b)):
            d = int((np.asarray(x) != np.asarray(y)).sum())
            print(f"{name}[{k}]: {d} mismatches")

    def bytes_of(img):
        return img.view(np.uint8).reshape(B, H, W, 4).astype(np.int32)

    bf, bs, bo = bytes_of(img_f), bytes_of(img_s), bytes_of(img_o)
    for name, x, y in (("fused vs split", bf, bs),
                       ("fused vs oracle", bf, bo),
                       ("split vs oracle", bs, bo)):
        d = np.abs(x - y)
        idx = np.argwhere(d > 0)
        print(f"{name}: {len(idx)} byte diffs, max={int(d.max())}")
        for b_, yy, xx, c in idx[:8]:
            print(f"  at frame={b_} y={yy} x={xx} ch={c}: "
                  f"{x[b_, yy, xx, c]} vs {y[b_, yy, xx, c]}")
            for nm, planes in (("split", gs), ("oracle", go)):
                v0, v1, v2, m = planes
                print(f"    {nm} gbuf: v0={v0[b_, yy, xx]!r} "
                      f"v1={v1[b_, yy, xx]!r} v2={v2[b_, yy, xx]!r} "
                      f"m={m[b_, yy, xx]!r}")
    return 0


if __name__ == "__main__":
    main()

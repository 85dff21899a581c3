#!/usr/bin/env python3
"""Dump terrain_fs intermediates at PLANE shape (600x800, the
production-reproducing configuration -- bytes 45/157) and diff the bits
against the tile/probe chain's values (bytes 44/158,
exp_fs_mosaic_ops.py). Both diverging pixels are planted in ONE input
plane so the whole probe is a single tunnel compile. The first differing
intermediate is the diverging op; cross-op barriers and the rsqrt
rewrite are already ruled out (exp_fs_fma_bisect.py, exp_fs_rsqrt.py)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Probe-chain bits (exp_fs_mosaic_ops) per pixel, keyed by intermediate.
PIXELS = [
    dict(hh=-0.02844862, xx=-0.6119954, zz=0.84231335, ch=0, col=400,
         bits={"t": 0x3ef8b797, "lin": 0x3cde8fd8, "dhdx": 0x3e68e9e2,
               "dhdz": 0xbe612734, "inv_len": 0x3f7413d2,
               "lambert": 0x3f55ef32, "shade": 0x3f5c3e84,
               "v": 0x3cd29fc3, "s": 0x3e32b2b0, "u8f": 0x42300000}),
    dict(hh=0.029899813, xx=-0.3251077, zz=-0.9206853, ch=1, col=402,
         bits={"t": 0x3f03d3c2, "lin": 0x3ed173bc, "dhdx": 0x3e97c223,
               "dhdz": 0x3e6ee11f, "inv_len": 0x3f6f86f1,
               "lambert": 0x3f361236, "shade": 0x3f412914,
               "v": 0x3eadd7a7, "s": 0x3f1e1e1e, "u8f": 0x431e0000}),
]
ROW = 300
SCALAR = ["t", "dhdx", "dhdz", "inv_len", "lambert", "shade"]
VEC3 = ["lin", "v", "s", "u8f"]


def main():
    import jax
    import jax.numpy as jnp
    from vulkan_forge import _colormap

    lut, _ = _colormap.build_lut("terrain")
    lut = jnp.asarray(lut, jnp.float32)
    sun = jnp.asarray([0.35, 0.9, 0.2], jnp.float32)
    exposure = jnp.float32(1.1)
    h_range = jnp.float32(1.0)
    H, W = 600, 800

    @jax.jit
    def run(h, x, z, mask):
        hr = jnp.maximum(h_range, 1e-8)
        t = jnp.clip(0.5 + h / (2.0 * hr), 0.0, 1.0)
        xf = t * 256.0 - 0.5
        x0 = jnp.floor(xf)
        frac = (xf - x0)[..., None]
        i0 = jnp.clip(x0, 0, 255).astype(jnp.int32)
        i1 = jnp.clip(x0 + 1.0, 0, 255).astype(jnp.int32)
        lut_rgb = (lut[i0] * (1.0 - frac) + lut[i1] * frac)[..., :3]
        dhdx = 1.3 * jnp.cos(x * 1.3) * 0.25
        dhdz = -1.1 * jnp.sin(z * 1.1) * 0.25
        inv_len = 1.0 / jnp.sqrt(dhdx * dhdx + 1.0 + dhdz * dhdz)
        l = sun / jnp.sqrt(jnp.sum(sun * sun))
        lambert = jnp.clip((-dhdx * l[0] + l[1] - dhdz * l[2]) * inv_len,
                           0.0, 1.0)
        shade = 0.15 + 0.85 * lambert
        rgb = lut_rgb * exposure * shade[..., None]
        clear = jnp.array([0.02, 0.02, 0.03], jnp.float32)
        rgb = jnp.where(mask[..., None], rgb, clear)
        c = jnp.clip(rgb, 0.0, 1.0)
        lo = c * 12.92
        hi = 1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055
        s = jnp.where(c <= 0.0031308, lo, hi)
        u8f = jnp.floor(jnp.clip(s, 0.0, 1.0) * 255.0 + 0.5)
        return jnp.concatenate(
            [jnp.stack([t, dhdx, dhdz, inv_len, lambert, shade], -1),
             lut_rgb, rgb, s, u8f], -1)          # (H, W, 18)

    h = np.zeros((H, W), np.float32)
    x = np.zeros((H, W), np.float32)
    z = np.zeros((H, W), np.float32)
    for p in PIXELS:
        h[ROW, p["col"]] = p["hh"]
        x[ROW, p["col"]] = p["xx"]
        z[ROW, p["col"]] = p["zz"]
    mask = jnp.ones((H, W), bool)
    out = np.asarray(jax.device_get(run(jnp.asarray(h), jnp.asarray(x),
                                        jnp.asarray(z), mask)))
    for p in PIXELS:
        px = out[ROW, p["col"]]
        print(f"pixel ch={p['ch']}:")
        for i, n in enumerate(SCALAR):
            got = np.float32(px[i])
            gb = int(got.view(np.uint32))
            wb = p["bits"][n]
            tag = "" if gb == wb else f"  <-- DIFF (probe {hex(wb)})"
            print(f"  {n:8s} {float(got):.9f} {hex(gb)}{tag}")
        for j, n in enumerate(VEC3):
            got = np.float32(px[6 + 3 * j + p["ch"]])
            gb = int(got.view(np.uint32))
            wb = p["bits"][n]
            tag = "" if gb == wb else f"  <-- DIFF (probe {hex(wb)})"
            print(f"  {n:8s} {float(got):.9f} {hex(gb)}{tag}")
    return 0


if __name__ == "__main__":
    main()

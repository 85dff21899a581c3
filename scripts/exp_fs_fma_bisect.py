#!/usr/bin/env python3
"""Bisect WHERE XLA's plane-shaped terrain_fs diverges from the unfused
op chain (the in-kernel tile FS and the intermediate-materialized XLA
probe both give 44/158; production terrain_fs gives 45/157 at those
pixels -- exp_fs_mosaic_ops.py). Hypothesis: XLA fuses a mul+add into an
FMA when the whole FS lives in one fusion. An optimization_barrier after
an intermediate forces that value to round to f32; the variant whose
single barrier flips the byte back identifies the fused op.

One jit computes the baseline + all single-barrier variants at once (one
tunnel compile)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PIXELS = [  # (hh, xx, zz, channel, fused/unfused byte, production byte)
    (-0.02844862, -0.6119954, 0.84231335, 0, 44, 45),
    (0.029899813, -0.3251077, -0.9206853, 1, 158, 157),
]

BARRIERS = ["none", "t", "xf", "frac", "lin", "n2", "lampre", "lambert",
            "shade", "v", "pow", "s", "all"]


def main():
    import jax
    import jax.numpy as jnp
    from vulkan_forge import _colormap

    lut, _ = _colormap.build_lut("terrain")
    lut = jnp.asarray(lut, jnp.float32)
    sun = jnp.asarray([0.35, 0.9, 0.2], jnp.float32)
    exposure = jnp.float32(1.1)
    h_range = jnp.float32(1.0)

    def fs_variant(h, x, z, mask, bar):
        def B(name, val):
            if bar == "all" or bar == name:
                return jax.lax.optimization_barrier(val)
            return val

        hr = jnp.maximum(h_range, 1e-8)
        t = B("t", jnp.clip(0.5 + h / (2.0 * hr), 0.0, 1.0))
        xf = B("xf", t * 256.0 - 0.5)
        x0 = jnp.floor(xf)
        frac = B("frac", (xf - x0)[..., None])
        i0 = jnp.clip(x0, 0, 255).astype(jnp.int32)
        i1 = jnp.clip(x0 + 1.0, 0, 255).astype(jnp.int32)
        c0 = lut[i0]
        c1 = lut[i1]
        lut_rgb = B("lin", (c0 * (1.0 - frac) + c1 * frac)[..., :3])
        dhdx = 1.3 * jnp.cos(x * 1.3) * 0.25
        dhdz = -1.1 * jnp.sin(z * 1.1) * 0.25
        n2 = B("n2", dhdx * dhdx + 1.0 + dhdz * dhdz)
        inv_len = 1.0 / jnp.sqrt(n2)
        l = sun / jnp.sqrt(jnp.sum(sun * sun))
        lampre = B("lampre", -dhdx * l[0] + l[1] - dhdz * l[2])
        lambert = B("lambert", jnp.clip(lampre * inv_len, 0.0, 1.0))
        shade = B("shade", 0.15 + 0.85 * lambert)
        rgb = lut_rgb * exposure * shade[..., None]
        clear = jnp.array([0.02, 0.02, 0.03], jnp.float32)
        rgb = B("v", jnp.where(mask[..., None], rgb, clear))
        c = jnp.clip(rgb, 0.0, 1.0)
        lo = c * 12.92
        p = B("pow", jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4))
        hi = 1.055 * p - 0.055
        s = B("s", jnp.where(c <= 0.0031308, lo, hi))
        u8 = jnp.floor(jnp.clip(s, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint32)
        one = jnp.uint32(255)
        return u8[..., 0] | (u8[..., 1] << 8) | (u8[..., 2] << 16) \
            | (one << 24)

    H, W = 600, 800

    @jax.jit
    def run_all(h, x, z, mask):
        return jnp.stack([fs_variant(h, x, z, mask, b) for b in BARRIERS])

    for hh, xx, zz, ch, want_unfused, want_prod in PIXELS:
        h = jnp.full((H, W), hh, jnp.float32)
        x = jnp.full((H, W), xx, jnp.float32)
        z = jnp.full((H, W), zz, jnp.float32)
        mask = jnp.ones((H, W), bool)
        out = np.asarray(jax.device_get(run_all(h, x, z, mask)))
        print(f"pixel ch={ch} (unfused chain says {want_unfused}, "
              f"production says {want_prod}):")
        for i, b in enumerate(BARRIERS):
            byte = int((out[i, 300, 400] >> (8 * ch)) & 0xFF)
            tag = ""
            if byte == want_unfused and b != "none":
                tag = "  <-- barrier here restores unfused rounding"
            print(f"  barrier={b:8s} byte={byte}{tag}")
    return 0


if __name__ == "__main__":
    main()

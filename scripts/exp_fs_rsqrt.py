#!/usr/bin/env python3
"""Confirm the diverging FS op: XLA lowers ``1.0 / jnp.sqrt(n2)`` to an
rsqrt flavor that differs from plain ``jax.lax.rsqrt`` by 1 ulp on rare
inputs (the barrier bisect ruled out cross-op FMA). Compare the full
plane-shaped production terrain_fs against a variant whose only change
is inv_len = lax.rsqrt(n2), at the two diverging pixels, plus a direct
bit dump of inv_len both ways."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PIXELS = [  # (hh, xx, zz, channel, unfused-chain byte, production byte)
    (-0.02844862, -0.6119954, 0.84231335, 0, 44, 45),
    (0.029899813, -0.3251077, -0.9206853, 1, 158, 157),
]


def main():
    import jax
    import jax.numpy as jnp
    from vulkan_forge import _colormap
    from vulkan_forge._raster import fragment

    lut, _ = _colormap.build_lut("terrain")
    lut = jnp.asarray(lut, jnp.float32)
    sun = jnp.asarray([0.35, 0.9, 0.2], jnp.float32)
    exposure = jnp.float32(1.1)
    h_range = jnp.float32(1.0)

    H, W = 600, 800

    @jax.jit
    def run(h, x, z, mask):
        prod = fragment.terrain_fs(h, x, z, mask, lut, h_range, exposure,
                                   sun)
        # inv_len both ways, same executable, plane-shaped.
        dhdx = 1.3 * jnp.cos(x * 1.3) * 0.25
        dhdz = -1.1 * jnp.sin(z * 1.1) * 0.25
        n2 = dhdx * dhdx + 1.0 + dhdz * dhdz
        inv_div = 1.0 / jnp.sqrt(n2)
        inv_rsq = jax.lax.rsqrt(n2)
        return prod, inv_div, inv_rsq

    for hh, xx, zz, ch, want_unfused, want_prod in PIXELS:
        h = jnp.full((H, W), hh, jnp.float32)
        x = jnp.full((H, W), xx, jnp.float32)
        z = jnp.full((H, W), zz, jnp.float32)
        mask = jnp.ones((H, W), bool)
        prod, inv_div, inv_rsq = jax.device_get(run(h, x, z, mask))
        byte = int((np.asarray(prod)[300, 400] >> (8 * ch)) & 0xFF)
        dv = np.float32(np.asarray(inv_div)[300, 400])
        rv = np.float32(np.asarray(inv_rsq)[300, 400])
        print(f"pixel ch={ch}: production byte={byte} "
              f"(unfused says {want_unfused}, prod-before {want_prod})")
        print(f"  inv_len 1/sqrt = {dv!r} {hex(dv.view(np.uint32))}")
        print(f"  inv_len rsqrt  = {rv!r} {hex(rv.view(np.uint32))}"
              f"{'   <-- DIFFER' if dv.view(np.uint32) != rv.view(np.uint32) else '   (same)'}")
    return 0


if __name__ == "__main__":
    main()

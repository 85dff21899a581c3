#!/usr/bin/env python3
"""Bit-level probe of ONE FS pixel both ways on TPU: XLA terrain_fs ops
vs the terrain_fs_tile op order, with the sun normalization computed (a)
inside the same executable as the FS (terrain_fs's own line) and (b) in
a separate prep executable (the fused kernels' par path). Prints the bit
patterns of every intermediate so the diverging op is visible."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    pixels = [  # (hh, xx, zz) from exp_resident_diff grid=48 800x600
        (-0.02844862, -0.6119954, 0.84231335),
        (0.029899813, -0.3251077, -0.9206853),
    ]
    sun = jnp.asarray([0.35, 0.9, 0.2], jnp.float32)
    exposure = jnp.float32(1.1)
    h_range = jnp.float32(1.0)

    @jax.jit
    def prep_l(sun):
        return sun / jnp.sqrt(jnp.sum(sun * sun))

    @jax.jit
    def fs_probe(hh, xx, zz, l, exposure, hr2):
        t = jnp.clip(0.5 + hh / hr2, 0.0, 1.0)
        dhdx = 1.3 * jnp.cos(xx * 1.3) * 0.25
        dhdz = -1.1 * jnp.sin(zz * 1.1) * 0.25
        inv_len_div = 1.0 / jnp.sqrt(dhdx * dhdx + 1.0 + dhdz * dhdz)
        inv_len_rsq = jax.lax.rsqrt(dhdx * dhdx + 1.0 + dhdz * dhdz)
        lam_div = jnp.clip((-dhdx * l[0] + l[1] - dhdz * l[2]) * inv_len_div,
                           0.0, 1.0)
        lam_rsq = jnp.clip((-dhdx * l[0] + l[1] - dhdz * l[2]) * inv_len_rsq,
                           0.0, 1.0)
        return (t, dhdx, dhdz, inv_len_div, inv_len_rsq, lam_div, lam_rsq,
                0.15 + 0.85 * lam_div, 0.15 + 0.85 * lam_rsq)

    @jax.jit
    def fs_inline(hh, xx, zz, sun, exposure, hr2):
        # terrain_fs's own structure: l computed in the SAME executable
        l = sun / jnp.sqrt(jnp.sum(sun * sun))
        dhdx = 1.3 * jnp.cos(xx * 1.3) * 0.25
        dhdz = -1.1 * jnp.sin(zz * 1.1) * 0.25
        inv_len = 1.0 / jnp.sqrt(dhdx * dhdx + 1.0 + dhdz * dhdz)
        lam = jnp.clip((-dhdx * l[0] + l[1] - dhdz * l[2]) * inv_len,
                       0.0, 1.0)
        return l, lam, 0.15 + 0.85 * lam

    hr2 = 2.0 * jnp.maximum(h_range, 1e-8)
    l_prep = jax.device_get(prep_l(sun))
    print("l (prep executable): ", [hex(b) for b in
                                    l_prep.view(np.uint32)])
    for hh, xx, zz in pixels:
        hh, xx, zz = (jnp.float32(v) for v in (hh, xx, zz))
        li, lam_i, sh_i = jax.device_get(fs_inline(hh, xx, zz, sun,
                                                   exposure, hr2))
        print("l (inline in FS):    ", [hex(b) for b in
                                        np.asarray(li).view(np.uint32)])
        out = jax.device_get(fs_probe(hh, xx, zz, jnp.asarray(l_prep),
                                      exposure, hr2))
        names = ("t", "dhdx", "dhdz", "inv_div", "inv_rsq", "lam_div",
                 "lam_rsq", "shade_div", "shade_rsq")
        for n, v in zip(names, out):
            print(f"  {n:10s} {float(v):.9f}  {hex(np.float32(v).view(np.uint32))}")
        print(f"  inline: lam={float(lam_i):.9f} "
              f"{hex(np.float32(lam_i).view(np.uint32))} "
              f"shade={float(sh_i):.9f}")
    return 0


if __name__ == "__main__":
    main()

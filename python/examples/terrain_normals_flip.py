#!/usr/bin/env python3
"""Directional lighting: east vs west sun on a Gaussian bump
(parity: python/examples/terrain_normals_flip.py -- which needed the then-
unimplemented Renderer.render_rgba(); implemented in this build)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))

import numpy as np
import vulkan_forge as vf


def bump(n, amp=50.0, sigma=0.18):
    yy, xx = np.mgrid[0:n, 0:n]
    c = (n - 1) / 2.0
    r2 = ((xx - c) ** 2 + (yy - c) ** 2) / (n ** 2)
    return (amp * np.exp(-r2 / (2 * sigma ** 2))).astype(np.float32)


for name, az in (("east", 90.0), ("west", 270.0)):
    r = vf.Renderer(400, 400)
    r.add_terrain(bump(256), spacing=(10.0, 10.0), exaggeration=1.0,
                  colormap="viridis")
    r.set_sun(elevation_deg=45.0, azimuth_deg=az)
    r.render_png(f"bump_{name}.png")
    print(f"wrote bump_{name}.png")

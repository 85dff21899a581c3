#!/usr/bin/env python3
"""Full DEM render with sun + exposure (parity: python/examples/terrain.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))

import numpy as np
import vulkan_forge as vf

r = vf.Renderer(800, 600)
x = np.linspace(-4, 4, 512, dtype=np.float32)
dem = ((np.sin(x[None, :]) * np.cos(x[:, None]) + 1.0) * 60.0).astype(np.float32)

r.add_terrain(dem, spacing=(20.0, 20.0), exaggeration=1.5, colormap="viridis")
r.set_sun(elevation_deg=35.0, azimuth_deg=120.0)
r.set_exposure(1.1)
r.render_png("terrain_demo.png")
print("wrote terrain_demo.png")
print("metrics:", r.render_metrics())

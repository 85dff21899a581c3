#!/usr/bin/env python3
"""DEM upload + stats + normalization (parity: python/examples/add_terrain.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))

import numpy as np
import vulkan_forge as vf

r = vf.Renderer(512, 512)
x = np.linspace(-3, 3, 256, dtype=np.float32)
dem = np.exp(-(x[None, :] ** 2 + x[:, None] ** 2)).astype(np.float32) * 100.0

r.add_terrain(dem, spacing=(25.0, 25.0), exaggeration=2.0, colormap="terrain")
print("stats (min, max, mean, std):", r.terrain_stats())

r.normalize_terrain("minmax", range=(0.0, 1.0))
print("after minmax:", r.terrain_stats())

r.upload_height_r32f()
patch = r.debug_read_height_patch(10, 10, 4, 4)
print("height patch:\n", patch)

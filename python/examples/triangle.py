#!/usr/bin/env python3
"""Render the deterministic gradient triangle (parity: python/examples/triangle.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))

import vulkan_forge as vf

arr = vf.render_triangle_rgba(512, 512)
print(f"rendered {arr.shape} {arr.dtype}")
vf.render_triangle_png("triangle.png", 512, 512)
print("wrote triangle.png")

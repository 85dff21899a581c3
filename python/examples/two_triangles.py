#!/usr/bin/env python3
"""Determinism demo: two renders must hash identically
(parity: python/examples/two-triangles.py)."""
import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))

import vulkan_forge as vf

a = vf.render_triangle_rgba(256, 256)
b = vf.render_triangle_rgba(256, 256)
ha = hashlib.sha256(a.tobytes()).hexdigest()
hb = hashlib.sha256(b.tobytes()).hexdigest()
print("hash A:", ha)
print("hash B:", hb)
assert ha == hb, "non-deterministic output!"
print("deterministic: OK")

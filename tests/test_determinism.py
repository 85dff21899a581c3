"""Byte-exact determinism of device output (contract: reference
tests/test_determinism.py -- SHA-256 of raw RGBA must match across runs)."""
import hashlib

import numpy as np
import pytest

from vulkan_forge import Renderer, Scene


@pytest.mark.timeout(60)
def test_triangle_bytes_repeatable():
    digests = set()
    for _ in range(3):
        r = Renderer(64, 64)
        a = r.render_triangle_rgba()
        assert a.shape == (64, 64, 4) and a.dtype == np.uint8
        digests.add(hashlib.sha256(a.tobytes()).hexdigest())
    assert len(digests) == 1


@pytest.mark.timeout(120)
def test_terrain_bytes_repeatable():
    digests = set()
    h = (np.outer(np.sin(np.linspace(0, 3, 33)),
                  np.cos(np.linspace(0, 2, 45))) * 0.3).astype(np.float32)
    for _ in range(2):
        s = Scene(160, 120, 32, "magma")
        s.set_height_from_r32f(h)
        img = s.render_rgba()
        digests.add(hashlib.sha256(img.tobytes()).hexdigest())
    assert len(digests) == 1


@pytest.mark.timeout(60)
def test_png_smoke(tmp_path):
    r = Renderer(64, 64)
    out = tmp_path / "triangle.png"
    r.render_triangle_png(str(out))
    assert out.exists() and out.stat().st_size > 0

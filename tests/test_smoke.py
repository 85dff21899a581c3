"""Fast end-to-end smoke + edge-coverage stability (contract: reference
tests/smoke_test.py and tests/edge_consistency.py)."""
import numpy as np

import vulkan_forge as vf


def test_smoke_triangle_and_terrain(tmp_path):
    a = vf.render_triangle_rgba(48, 32)
    assert a.shape == (32, 48, 4) and a.dtype == np.uint8
    t = vf.make_terrain(48, 32, 8)
    t.render_png(str(tmp_path / "t.png"))
    assert (tmp_path / "t.png").stat().st_size > 0


def test_edge_coverage_count_stable():
    # The triangle's covered-pixel count (non-white vs the white clear) must
    # be identical across renders: rasterization edges are deterministic.
    counts = set()
    for _ in range(3):
        img = vf.render_triangle_rgba(97, 61)  # odd sizes stress edges
        non_white = np.any(img[..., :3] != 255, axis=-1)
        counts.add(int(non_white.sum()))
    assert len(counts) == 1
    assert counts.pop() > 0


def test_render_metrics_populated():
    r = vf.Renderer(32, 32)
    assert r.render_metrics()["render_ms"] is None
    r.render_triangle_rgba()
    m = r.render_metrics()
    assert m["render_ms"] is not None and m["render_ms"] >= 0.0
    assert m["bytes"] == 32 * 32 * 4

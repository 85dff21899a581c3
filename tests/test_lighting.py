"""Directional lighting & tonemap (contract: reference tests/test_tonemap.py
and the env-gated tests/test_terrain_fs.py east/west sun flip -- un-gated
here because Renderer.render_rgba() is implemented)."""
import os

import numpy as np
import pytest

import vulkan_forge as vf


def reinhard(x):
    return x / (1.0 + x)


def gamma_correct(x, gamma=2.2):
    return np.maximum(x, 0.0) ** (1.0 / gamma)


def tonemap_cpu(rgb, exposure=1.0):
    return gamma_correct(reinhard(rgb * exposure), 2.2)


def test_tonemap_cpu_reference_ranges():
    rgb = np.array([0.0, 0.18, 4.0], dtype=np.float32)
    out = tonemap_cpu(rgb, 1.0)
    assert out.dtype == np.float32
    assert np.all(out >= 0.0) and np.all(out <= 1.0)
    assert np.isclose(out[0], 0.0, atol=1e-6)
    assert 0.4 < out[1] < 0.6
    assert out[2] < 1.0


def test_sun_and_exposure_validation():
    r = vf.Renderer(16, 16)
    r.set_sun(45.0, 30.0)
    with pytest.raises(ValueError, match="exposure must be > 0"):
        r.set_exposure(0.0)
    with pytest.raises(ValueError, match="angles must be finite"):
        r.set_sun(float("nan"), 0.0)
    r.set_exposure(1.25)


def _luminance(img):
    rgb = img[..., :3].astype(np.float32) / 255.0
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]


def _bump(h, w, amp=1.0, sigma=0.18):
    yy, xx = np.mgrid[0:h, 0:w]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    r2 = ((xx - cx) ** 2 + (yy - cy) ** 2) / (max(h, w) ** 2)
    return (amp * np.exp(-r2 / (2 * sigma ** 2))).astype(np.float32)


def _render_with_sun(azimuth_deg):
    R = vf.Renderer(128, 128)
    dem = _bump(128, 128, amp=50.0)
    R.add_terrain(dem, (30.0, 30.0), exaggeration=1.0, colormap="viridis")
    R.set_sun(elevation_deg=45.0, azimuth_deg=azimuth_deg)
    return R.render_rgba()


@pytest.mark.skipif(os.environ.get("VF_ENABLE_TERRAIN_TESTS", "1") == "0",
                    reason="disabled via VF_ENABLE_TERRAIN_TESTS=0")
def test_east_west_sun_flip():
    """Mid-row luminance PROFILES (reference tests/test_terrain_fs.py
    semantics): with an east sun the entire east slope of the bump is
    brighter than the west slope, row by row -- not just one pixel pair."""
    east = _render_with_sun(90.0)
    west = _render_with_sun(270.0)
    assert np.isfinite(east).all() and np.isfinite(west).all()

    Y_e = _luminance(east)
    Y_w = _luminance(west)
    h, w = Y_e.shape
    cx = w // 2
    dx = 16

    # Row-by-row paired comparison across the bump's mid band (the
    # reference's single-row pair check, repeated over 9 rows). The default
    # camera is diagonal, so the screen-x flip direction is taken from the
    # pinned single-pixel semantics, not from wide averaged bands.
    rows = list(range(h // 2 - 12, h // 2 + 13, 3))
    e_wins = sum(Y_e[y, cx + dx] > Y_e[y, cx - dx] for y in rows)
    w_wins = sum(Y_w[y, cx - dx] > Y_w[y, cx + dx] for y in rows)
    n = len(rows)
    assert e_wins == n, f"east sun: only {e_wins}/{n} rows brighter at +dx"
    assert w_wins == n, f"west sun: only {w_wins}/{n} rows brighter at -dx"

    # The difference field must have SUBSTANTIAL two-sided structure: an
    # east<->west sun swap relights opposite slopes, it does not just scale
    # brightness. (Catches a shader that ignores sun azimuth.)
    D = Y_e - Y_w
    thr = 0.01 * max(Y_e.max(), Y_w.max())
    frac_pos = (D > thr).mean()
    frac_neg = (D < -thr).mean()
    assert frac_pos > 0.03, f"no east-lit region (frac={frac_pos:.4f})"
    assert frac_neg > 0.03, f"no west-lit region (frac={frac_neg:.4f})"
    # ... and it is a mirror, not a bias: both sides have equal area.
    np.testing.assert_allclose(frac_pos, frac_neg, rtol=0.25)

    # And total energy is approximately conserved under the mirror.
    np.testing.assert_allclose(Y_e.mean(), Y_w.mean(), rtol=0.06)


def test_exposure_brightens_render_rgba():
    R = vf.Renderer(96, 96)
    R.add_terrain(_bump(64, 64, amp=20.0), (10.0, 10.0), 1.0, "terrain")
    R.set_exposure(0.5)
    dark = _luminance(R.render_rgba()).mean()
    R.set_exposure(2.0)
    bright = _luminance(R.render_rgba()).mean()
    assert bright > dark


def test_render_rgba_requires_terrain():
    R = vf.Renderer(32, 32)
    with pytest.raises(RuntimeError, match="no terrain uploaded"):
        R.render_rgba()


def test_render_png_writes_terrain(tmp_path):
    R = vf.Renderer(96, 96)
    R.add_terrain(_bump(64, 64, amp=20.0), (10.0, 10.0), 1.0, "terrain")
    out = tmp_path / "dem.png"
    R.render_png(str(out))
    assert out.exists() and out.stat().st_size > 2048

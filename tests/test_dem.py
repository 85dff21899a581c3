"""DEM stats / normalization / height-range semantics (contract: reference
tests/test_dem_stats.py, tests/test_dem_normalization.py)."""
import numpy as np
import pytest

import vulkan_forge as vf


def _plane(h, w):
    x = np.linspace(-1, 1, w, dtype=np.float32)
    y = np.linspace(-1, 1, h, dtype=np.float32)
    X, Y = np.meshgrid(x, y)
    return 0.25 * np.sin(1.3 * X) + 0.25 * np.cos(1.1 * Y)


def test_dem_stats_basic():
    mn, mx, mean, std = vf.dem_stats(_plane(32, 48))
    assert mx > mn and std > 0.0


def test_dem_stats_validation():
    with pytest.raises(RuntimeError, match="heightmap must be 2-D"):
        vf.dem_stats(np.zeros(4, dtype=np.float32))
    with pytest.raises(RuntimeError, match="heightmap must be 2-D"):
        vf.dem_stats(np.zeros((4, 4), dtype=np.int32))
    with pytest.raises(RuntimeError, match="C-contiguous"):
        vf.dem_stats(np.asfortranarray(np.zeros((4, 5), dtype=np.float32)))


def test_dem_normalize_minmax():
    Z = _plane(16, 20)
    N = vf.dem_normalize(Z, mode="minmax", out_range=(0.0, 1.0))
    assert N.shape == Z.shape and N.dtype == np.float32
    assert N.min() >= -1e-5 and N.max() <= 1.0 + 1e-5


def test_dem_normalize_zscore_and_stats():
    Z = _plane(16, 20)
    out, stats = vf.dem_normalize(Z, mode="zscore", return_stats=True)
    assert len(stats) == 4
    assert abs(float(out.mean())) < 1e-4


def test_dem_normalize_bad_mode():
    with pytest.raises(ValueError, match="mode must be 'minmax' or 'zscore'"):
        vf.dem_normalize(_plane(4, 4), mode="log")


def test_renderer_stats_with_exaggeration():
    r = vf.Renderer(16, 16)
    hm = np.linspace(0.0, 1.0, 16, dtype=np.float32).reshape(4, 4)
    r.add_terrain(hm, (1.0, 1.0), 2.0, colormap="viridis")
    mn, mx, mean, std = r.terrain_stats()
    assert mn == pytest.approx(0.0)
    assert mx == pytest.approx(2.0)
    assert mean == pytest.approx(1.0)
    expected_std = np.std(np.linspace(0.0, 2.0, 16, dtype=np.float32))
    assert std == pytest.approx(expected_std, rel=1e-3)


def test_renderer_normalize_minmax_then_zscore():
    r = vf.Renderer(8, 8)
    hm = np.linspace(0.0, 1.0, 9, dtype=np.float64).reshape(3, 3)
    r.add_terrain(hm, (1.0, 1.0), 1.0, colormap="magma")
    r.normalize_terrain("minmax", range=(10.0, 20.0), eps=None)
    mn, mx, _, _ = r.terrain_stats()
    assert mn == pytest.approx(10.0, rel=1e-5)
    assert mx == pytest.approx(20.0, rel=1e-5)
    r.normalize_terrain("zscore", range=None, eps=1e-6)
    mn, mx, mean, std = r.terrain_stats()
    assert abs(mean) < 1e-5
    assert std == pytest.approx(1.0, rel=1e-3)


def test_renderer_normalize_requires_terrain_and_mode():
    r = vf.Renderer(8, 8)
    with pytest.raises(RuntimeError, match="no terrain uploaded"):
        r.normalize_terrain("minmax")
    r.add_terrain(np.zeros((2, 2), np.float32) + 1.0, (1.0, 1.0), 1.0, "viridis")
    with pytest.raises(RuntimeError, match="mode must be 'minmax' or 'zscore'"):
        r.normalize_terrain("median")


def test_set_height_range_validation():
    r = vf.Renderer(32, 32)
    h = np.linspace(-10.0, 50.0, 32 * 32, dtype=np.float32).reshape(32, 32)
    r.add_terrain(h, (1.0, 1.0), 1.0, "viridis")
    r.set_height_range(-5.0, 40.0)
    with pytest.raises(ValueError, match="min must be < max"):
        r.set_height_range(1.0, 1.0)
    with pytest.raises(ValueError, match="min must be < max"):
        r.set_height_range(2.0, -3.0)
    with pytest.raises(ValueError, match="finite"):
        r.set_height_range(float("nan"), 1.0)


def test_percentile_clamped_range_stride_sampling():
    from vulkan_forge._dem import min_max
    data = np.arange(200_000, dtype=np.float32)
    p1, p99 = min_max(data, clamp=True)
    # Deterministic stride sampling (len//65536 = 3) then truncated-index
    # percentiles (src/terrain_stats.rs:22-34).
    assert 0.0 < p1 < p99 < 200_000.0
    assert p1 == pytest.approx(2000, rel=0.02)
    assert p99 == pytest.approx(198_000, rel=0.02)
    lo, hi = min_max(data, clamp=False)
    assert lo == 0.0 and hi == 199_999.0

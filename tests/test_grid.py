"""grid_generate semantics (contract: reference tests/test_grid_generate.py
+ Rust unit tests in src/terrain/mesh.rs)."""
import numpy as np
import pytest

from vulkan_forge import grid_generate
from vulkan_forge._mesh import make_grid


def test_shapes_and_dtypes():
    xy, uv, idx = grid_generate(4, 3, spacing=(2.0, 1.0))
    assert xy.shape == (12, 2) and xy.dtype == np.float32
    assert uv.shape == (12, 2) and uv.dtype == np.float32
    assert idx.shape == (36,) and idx.dtype == np.uint32


def test_uv_corners():
    _, uv, _ = grid_generate(4, 3, spacing=(2.0, 1.0))
    np.testing.assert_array_almost_equal(uv[0], [0.0, 0.0])
    np.testing.assert_array_almost_equal(uv[3], [1.0, 0.0])
    np.testing.assert_array_almost_equal(uv[8], [0.0, 1.0])
    np.testing.assert_array_almost_equal(uv[11], [1.0, 1.0])


def test_first_triangle_is_ccw():
    xy, _, idx = grid_generate(3, 3, spacing=(1.0, 1.0))
    p0, p1, p2 = xy[idx[0]], xy[idx[1]], xy[idx[2]]
    cross_z = (p1[0] - p0[0]) * (p2[1] - p0[1]) - (p1[1] - p0[1]) * (p2[0] - p0[0])
    assert cross_z > 0


def test_centered_positions():
    xy, _, _ = grid_generate(3, 3, spacing=(2.0, 2.0))
    expected = [[-2, -2], [0, -2], [2, -2],
                [-2, 0], [0, 0], [2, 0],
                [-2, 2], [0, 2], [2, 2]]
    np.testing.assert_array_almost_equal(xy, expected)


def test_large_grid_u32_and_counts():
    xy, uv, idx = grid_generate(256, 256)
    assert idx.dtype == np.uint32
    assert xy.shape == (256 * 256, 2)
    assert idx.shape == (255 * 255 * 2 * 3,)


def test_internal_index_dtype_switch():
    # 255*255=65025 verts fits u16; 256*256=65536 needs u32
    # (src/terrain/mesh.rs:29-32 switch semantics).
    _, _, small = make_grid(255, 255, 1.0, 1.0)
    _, _, big = make_grid(256, 256, 1.0, 1.0)
    assert small.dtype == np.uint16
    assert big.dtype == np.uint32


@pytest.mark.parametrize("args,kwargs,msg", [
    ((1, 3), {}, "nx and nz must be >= 2"),
    ((3, 1), {}, "nx and nz must be >= 2"),
    ((3, 3), {"spacing": (0.0, 1.0)}, "spacing components must be finite and > 0"),
    ((3, 3), {"spacing": (1.0, -1.0)}, "spacing components must be finite and > 0"),
    ((3, 3), {"spacing": (float("inf"), 1.0)}, "spacing components must be finite and > 0"),
    ((3, 3), {"origin": "corner"}, "origin must be 'center'"),
])
def test_validation_messages(args, kwargs, msg):
    with pytest.raises(ValueError, match=msg):
        grid_generate(*args, **kwargs)


def test_legacy_alias():
    import vulkan_forge as vf
    assert vf.generate_grid is vf.grid_generate


def test_native_matches_numpy_if_available():
    from vulkan_forge import _native
    out = _native.grid_generate_native(7, 5, 1.25, 0.5)
    if out is None:
        pytest.skip("native core unavailable")
    xy_n, uv_n, idx_n = out
    xy, uv, idx = grid_generate(7, 5, spacing=(1.25, 0.5))
    np.testing.assert_array_equal(xy_n, xy)
    np.testing.assert_array_equal(uv_n, uv)
    np.testing.assert_array_equal(idx_n, idx)

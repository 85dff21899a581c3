"""Public API surface & validation (contract: reference tests/test_api.py,
tests/test_api_validation.py)."""
import numpy as np
import pytest

import vulkan_forge as vf


def test_exports_and_version():
    for name in ("Renderer", "render_triangle_rgba", "render_triangle_png",
                 "make_terrain", "colormap_supported", "camera_look_at",
                 "camera_perspective", "camera_view_proj", "__version__",
                 "dem_stats", "dem_normalize", "grid_generate", "generate_grid"):
        assert hasattr(vf, name), name
    assert isinstance(vf.__version__, str)


def test_ext_module_path_compat():
    # The reference's compiled module path stays importable.
    import vulkan_forge._vulkan_forge as ext
    assert ext.Renderer is vf.Renderer
    assert hasattr(ext, "TerrainSpike") and hasattr(ext, "Scene")
    assert hasattr(ext, "enumerate_adapters") and hasattr(ext, "device_probe")


def test_vshade_alias_identity():
    from vshade import Renderer as R2
    assert R2 is vf.Renderer


def test_render_triangle_rgba_shape_dtype():
    a = vf.render_triangle_rgba(32, 24)
    assert a.shape == (24, 32, 4)
    assert a.dtype == np.uint8


def test_renderer_info_string():
    r = vf.Renderer(17, 9)
    assert r.info() == "Renderer 17x9, format=Rgba8UnormSrgb"


def test_size_validation(tmp_path):
    with pytest.raises(ValueError):
        vf.render_triangle_png(tmp_path / "x.png", 0, 10)
    with pytest.raises(ValueError):
        vf.render_triangle_png(tmp_path / "x.png", 10, -1)
    with pytest.raises(ValueError):
        vf.render_triangle_rgba(9000, 4)
    with pytest.raises(ValueError):
        vf.render_triangle_png(tmp_path / "x.jpg", 10, 10)  # extension check
    with pytest.raises(ValueError):
        vf.render_triangle_png(tmp_path / "nope" / "x.png", 10, 10)  # missing dir


def test_png_write(tmp_path):
    out = tmp_path / "tri.png"
    vf.render_triangle_png(str(out), 32, 24)
    assert out.exists() and out.stat().st_size > 0


def test_make_terrain_validation(tmp_path):
    with pytest.raises(ValueError):
        vf.make_terrain(64, 64, 1)  # grid must be >= 2
    with pytest.raises(ValueError):
        vf.make_terrain(64, 64, 5000)  # grid must be <= 4096
    t = vf.make_terrain(64, 48, 16)
    out = tmp_path / "t.png"
    t.render_png(str(out))
    assert out.exists() and out.stat().st_size > 0


def test_size_wh_rule_ordering():
    # Reference shim rule ordering (python/vulkan_forge/_validate.py:15-22):
    # BOTH dims pass > 0 before either is held to the <= 8192 bound.
    from vulkan_forge._validate import size_wh
    with pytest.raises(ValueError, match="width and height must be > 0"):
        size_wh(9000, 0)
    with pytest.raises(ValueError, match="width and height must be > 0"):
        size_wh(0, 9000)
    with pytest.raises(ValueError, match="width/height must be <= 8192"):
        size_wh(9000, 16)
    with pytest.raises(ValueError, match="must be an integer"):
        size_wh("x", 16)
    assert size_wh(8192, 1) == (8192, 1)

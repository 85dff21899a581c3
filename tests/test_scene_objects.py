"""TerrainSpike / Scene behavior (contract: reference
tests/test_t31_integration.py, tests/test_t41_scene.py)."""
import numpy as np
import pytest

import vulkan_forge._vulkan_forge as ext


def test_spike_render_png_nontrivial(tmp_path):
    spike = ext.TerrainSpike(320, 240, grid=64, colormap="viridis")
    out = tmp_path / "terrain_smoke.png"
    spike.render_png(str(out))
    assert out.exists()
    assert out.stat().st_size > 4096  # non-uniform image


def test_scene_render_png_nontrivial(tmp_path):
    out = tmp_path / "scene_smoke.png"
    scn = ext.Scene(320, 240, grid=64, colormap="viridis")
    scn.render_png(str(out))
    assert out.exists()
    assert out.stat().st_size > 4096


def test_scene_height_upload_changes_output(tmp_path):
    out1 = tmp_path / "scene1.png"
    out2 = tmp_path / "scene2.png"
    scn = ext.Scene(320, 240, grid=64, colormap="viridis")
    scn.render_png(str(out1))
    h = (np.sin(np.linspace(0, 4 * np.pi, 128))[:, None]
         * np.cos(np.linspace(0, 4 * np.pi, 128))[None, :]).astype("float32") * 0.25
    scn.set_height_from_r32f(h)
    scn.render_png(str(out2))
    assert out1.stat().st_size != out2.stat().st_size


def test_scene_height_upload_validation():
    scn = ext.Scene(64, 64, grid=8)
    with pytest.raises(Exception):
        scn.set_height_from_r32f(np.zeros((4, 4), dtype=np.float64))
    with pytest.raises(RuntimeError, match="C-contiguous"):
        scn.set_height_from_r32f(np.asfortranarray(np.zeros((4, 5), np.float32)))


def test_spike_grid_minimum_is_two():
    spike = ext.TerrainSpike(32, 32, grid=0)  # clamped to 2, like grid.max(2)
    assert spike.grid == 2


def test_default_sun_dirs_differ():
    # TerrainSpike seeds sun from light (0.5,1,0.3) (src/terrain/mod.rs:327);
    # Scene keeps the Globals default (0.5,0.8,0.6) (src/scene/mod.rs:119).
    spike = ext.TerrainSpike(32, 32, grid=4)
    scene = ext.Scene(32, 32, grid=4)
    us, uc = spike.debug_uniforms_f32(), scene.debug_uniforms_f32()
    light = np.array([0.5, 1.0, 0.3]) / np.linalg.norm([0.5, 1.0, 0.3])
    default = np.array([0.5, 0.8, 0.6]) / np.linalg.norm([0.5, 0.8, 0.6])
    np.testing.assert_allclose(us[32:35], light, atol=1e-6)
    np.testing.assert_allclose(uc[32:35], default, atol=1e-6)
    assert us[35] == 1.0 and uc[35] == 1.0  # exposure lane


def test_spike_vs_scene_first_frame_differs():
    # Different dummy heights (1x1 zero vs 2x2 gradient) and sun dirs must
    # produce different pixels.
    spike = ext.TerrainSpike(160, 120, grid=32)
    scene = ext.Scene(160, 120, grid=32)
    assert not np.array_equal(spike.render_rgba(), scene.render_rgba())


def test_colormap_changes_pixels():
    a = ext.TerrainSpike(160, 120, grid=32, colormap="viridis").render_rgba()
    b = ext.TerrainSpike(160, 120, grid=32, colormap="magma").render_rgba()
    assert not np.array_equal(a, b)

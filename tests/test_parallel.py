"""Multi-device frame-parallel rendering (single-device mesh on the real
chip; the multi-chip compile/exec path is exercised by
__graft_entry__.dryrun_multichip on a virtual CPU mesh)."""
import numpy as np

import vulkan_forge as vf
from vulkan_forge._parallel import render_spike_frames


def test_render_spike_frames_single_device_mesh():
    import jax
    eyes = [(3.0, 2.0, 3.0), (-3.0, 2.0, 3.0)]
    imgs = render_spike_frames(160, 120, 16, eyes, devices=jax.devices()[:1])
    assert imgs.shape == (2, 120, 160, 4) and imgs.dtype == np.uint8
    # Different cameras produce different frames.
    assert not np.array_equal(imgs[0], imgs[1])
    # Matches the single-frame API for the same camera.
    t = vf.TerrainSpike(160, 120, 16)
    t.set_camera_look_at(eyes[0], (0, 0, 0), (0, 1, 0), 45.0, 0.1, 100.0)
    np.testing.assert_array_equal(imgs[0], t.render_rgba())


def test_dryrun_multichip_8_device_mesh():
    # The driver's multi-chip validation: with only 1 real chip available,
    # dryrun_multichip must self-host on an 8-device virtual CPU mesh
    # (re-exec'ing with --xla_force_host_platform_device_count since JAX is
    # already initialized in this process).
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)  # raises on failure


def test_render_spike_frames_dense_route(monkeypatch):
    # Dense meshes route through the packed-stream path (no capacity
    # prepass); it must produce the same frames as the single-frame API.
    import jax
    from vulkan_forge._raster import pipeline
    monkeypatch.setattr(pipeline, "SEGMENT_THRESHOLD", 1)
    eyes = [(3.0, 2.0, 3.0), (-3.0, 2.0, 3.0)]
    imgs = render_spike_frames(160, 120, 16, eyes, devices=jax.devices()[:1])
    assert imgs.shape == (2, 120, 160, 4)
    t = vf.TerrainSpike(160, 120, 16)
    t.set_camera_look_at(eyes[0], (0, 0, 0), (0, 1, 0), 45.0, 0.1, 100.0)
    np.testing.assert_array_equal(imgs[0], t.render_rgba())


def test_render_spike_frames_validation():
    import jax
    import pytest
    with pytest.raises(ValueError, match="divisible"):
        render_spike_frames(64, 64, 8, [(3, 2, 3)] * 3,
                            devices=jax.devices()[:1] * 2)
    with pytest.raises(RuntimeError, match="Unknown colormap"):
        render_spike_frames(64, 64, 8, [(3, 2, 3)], colormap="bad")

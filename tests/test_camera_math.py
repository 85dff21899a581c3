"""Camera math: numerics, exact error strings, uniform layout (contract:
reference tests/test_camera.py)."""
import re

import numpy as np
import pytest

import vulkan_forge as vf
import vulkan_forge._vulkan_forge as ext

E_FOVY = re.escape("fovy_deg must be finite and in (0, 180)")
E_NEAR = re.escape("znear must be finite and > 0")
E_FAR = re.escape("zfar must be finite and > znear")
E_ASPECT = re.escape("aspect must be finite and > 0")
E_FINITE = re.escape("eye/target/up components must be finite")
E_COLINEAR = re.escape("up vector must not be colinear with view direction")
E_CLIP = re.escape("clip_space must be 'wgpu' or 'gl'")

EYE = (0.0, 0.0, 3.0)
TGT = (0.0, 0.0, 0.0)
UP = (0.0, 1.0, 0.0)


def test_look_at_shape_dtype_contiguity():
    m = vf.camera_look_at(EYE, TGT, UP)
    assert m.shape == (4, 4) and m.dtype == np.float32 and m.flags.c_contiguous


def test_look_at_translation():
    m = vf.camera_look_at(EYE, TGT, UP)
    assert abs(m[2, 3] - (-3.0)) < 1e-6


def test_look_at_orthonormal_rotation():
    m = vf.camera_look_at((1.0, 2.0, 3.0), (0.5, -0.25, 0.0), (0.0, 1.0, 0.0))
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    assert abs(np.linalg.det(r) - 1.0) < 1e-5


@pytest.mark.parametrize("bad", [
    ((float("inf"), 0, 0), TGT, UP),
    (EYE, (float("nan"), 0, 0), UP),
    (EYE, TGT, (0, float("inf"), 0)),
])
def test_look_at_nonfinite(bad):
    with pytest.raises(RuntimeError, match=E_FINITE):
        vf.camera_look_at(*bad)


def test_look_at_colinear_up():
    with pytest.raises(RuntimeError, match=E_COLINEAR):
        vf.camera_look_at(EYE, TGT, (0.0, 0.0, -1.0))


def test_perspective_shape_default_clip():
    p = vf.camera_perspective(45.0, 16.0 / 9.0, 0.1, 100.0)
    assert p.shape == (4, 4) and p.dtype == np.float32 and p.flags.c_contiguous
    np.testing.assert_array_equal(p, vf.camera_perspective(45.0, 16.0 / 9.0, 0.1, 100.0, "wgpu"))


def test_perspective_gl_vs_wgpu():
    gl = vf.camera_perspective(45.0, 1.0, 0.1, 100.0, "gl")
    wg = vf.camera_perspective(45.0, 1.0, 0.1, 100.0, "wgpu")
    assert not np.allclose(gl, wg)
    np.testing.assert_allclose(gl[:2, :], wg[:2, :], rtol=1e-5, atol=1e-6)
    # wgpu Z row = 0.5*gl Z row + 0.5*w row (the [-1,1]->[0,1] remap).
    np.testing.assert_allclose(wg[2, :], 0.5 * gl[2, :] + 0.5 * gl[3, :],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("args,err", [
    ((0.0, 1.0, 0.1, 100.0), E_FOVY),
    ((180.0, 1.0, 0.1, 100.0), E_FOVY),
    ((float("inf"), 1.0, 0.1, 100.0), E_FOVY),
    ((45.0, 0.0, 0.1, 100.0), E_ASPECT),
    ((45.0, float("inf"), 0.1, 100.0), E_ASPECT),
    ((45.0, 1.0, 0.0, 100.0), E_NEAR),
    ((45.0, 1.0, float("nan"), 100.0), E_NEAR),
    ((45.0, 1.0, 0.1, 0.05), E_FAR),
    ((45.0, 1.0, 0.1, float("inf")), E_FAR),
])
def test_perspective_validation(args, err):
    with pytest.raises(RuntimeError, match=err):
        vf.camera_perspective(*args)


def test_perspective_clip_space_validation():
    with pytest.raises(RuntimeError, match=E_CLIP):
        vf.camera_perspective(45.0, 1.0, 0.1, 100.0, "metal")


def test_view_proj_composition():
    vp = vf.camera_view_proj(EYE, TGT, UP, 45.0, 16.0 / 9.0, 0.1, 100.0, "wgpu")
    view = vf.camera_look_at(EYE, TGT, UP)
    proj = vf.camera_perspective(45.0, 16.0 / 9.0, 0.1, 100.0, "wgpu")
    np.testing.assert_allclose(vp, proj @ view, rtol=1e-5, atol=1e-6)


def test_view_proj_validation_order():
    with pytest.raises(RuntimeError, match=E_FOVY):
        vf.camera_view_proj(EYE, TGT, UP, 0.0, 1.0, 0.1, 100.0)
    with pytest.raises(RuntimeError, match=E_COLINEAR):
        vf.camera_view_proj(EYE, TGT, (0.0, 0.0, -1.0), 45.0, 1.0, 0.1, 100.0)


# ---- TerrainSpike camera integration (44-float uniform layout) ----

def test_spike_uniforms_shape_and_lanes():
    spike = ext.TerrainSpike(256, 192, grid=64, colormap="viridis")
    u = spike.debug_uniforms_f32()
    assert isinstance(u, np.ndarray) and u.dtype == np.float32 and u.shape == (44,)
    spacing, h_range, exag, zero = u[36], u[37], u[38], u[39]
    assert abs(spacing - 1.0) < 1e-6
    assert abs(h_range - 1.0) < 1e-6
    assert abs(exag - 1.0) < 1e-6
    assert abs(zero) < 1e-6
    assert np.all(u[40:44] == 0.0)  # _pad_tail


def test_spike_set_camera_updates_uniforms():
    spike = ext.TerrainSpike(512, 512)
    before = spike.debug_uniforms_f32()
    spike.set_camera_look_at((1, 2, 3), (0, 0, 0), (0, 1, 0), 60.0, 0.1, 100.0)
    after = spike.debug_uniforms_f32()
    assert not np.allclose(before, after)


def test_spike_set_camera_validates():
    spike = ext.TerrainSpike(512, 512)
    with pytest.raises(RuntimeError, match=E_FOVY):
        spike.set_camera_look_at(EYE, TGT, UP, 0.0, 0.1, 100.0)
    with pytest.raises(RuntimeError, match=E_COLINEAR):
        spike.set_camera_look_at(EYE, TGT, (0.0, 0.0, -1.0), 45.0, 0.1, 100.0)


def test_spike_uniforms_match_camera_functions():
    spike = ext.TerrainSpike(512, 512)
    spike.set_camera_look_at(EYE, TGT, UP, 45.0, 0.1, 100.0)
    u = spike.debug_uniforms_f32()
    view = u[:16].reshape(4, 4, order="F")     # stored column-major
    proj = u[16:32].reshape(4, 4, order="F")
    np.testing.assert_allclose(view, vf.camera_look_at(EYE, TGT, UP),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(proj, vf.camera_perspective(45.0, 1.0, 0.1, 100.0, "wgpu"),
                               rtol=1e-5, atol=1e-6)


def test_spike_default_proj_is_wgpu_clip():
    W, H = 128, 96
    t = ext.TerrainSpike(W, H, grid=32)
    u = t.debug_uniforms_f32()
    proj = np.array(u[16:32], dtype=np.float32).reshape(4, 4, order="F")
    expected = vf.camera_perspective(45.0, W / H, 0.1, 100.0, clip_space="wgpu")
    assert np.allclose(proj, expected, atol=1e-6)


# ---- reference test-tail parity (tests/test_camera.py long tail) ----

def test_look_at_numerical_z_translation():
    """Camera at (0,0,3) looking at origin: view[2,3] == -3 (RH, -Z fwd)."""
    m = vf.camera_look_at(EYE, TGT, UP)
    assert abs(float(m[2, 3]) - (-3.0)) < 1e-6


@pytest.mark.parametrize("eye,tgt,up", [
    ((float("inf"), 0.0, 0.0), TGT, UP),
    (EYE, (float("nan"), 0.0, 0.0), UP),
    (EYE, TGT, (0.0, float("inf"), 0.0)),
])
def test_look_at_nonfinite_each_argument(eye, tgt, up):
    with pytest.raises(RuntimeError, match=E_FINITE):
        vf.camera_look_at(eye, tgt, up)


def test_view_proj_validates_fovy_and_colinear_up():
    with pytest.raises(RuntimeError, match=E_FOVY):
        vf.camera_view_proj(EYE, TGT, UP, 0.0, 1.0, 0.1, 100.0)
    with pytest.raises(RuntimeError, match=E_COLINEAR):
        vf.camera_view_proj(EYE, TGT, (0.0, 0.0, -1.0), 45.0, 1.0, 0.1, 100.0)


@pytest.mark.parametrize("fovy", [180.0, -10.0, float("nan")])
def test_perspective_fovy_edge_values(fovy):
    with pytest.raises(RuntimeError, match=E_FOVY):
        vf.camera_perspective(fovy, 1.0, 0.1, 100.0)


def test_perspective_zfar_must_exceed_znear():
    with pytest.raises(RuntimeError, match=E_FAR):
        vf.camera_perspective(45.0, 1.0, 1.0, 1.0)
    with pytest.raises(RuntimeError, match=E_FAR):
        vf.camera_perspective(45.0, 1.0, 1.0, 0.5)


def test_gl_clip_depth_range_differs_only_in_rows_2():
    """gl vs wgpu projections agree except the depth (z) rows."""
    gl = vf.camera_perspective(45.0, 1.5, 0.1, 100.0, "gl")
    wg = vf.camera_perspective(45.0, 1.5, 0.1, 100.0, "wgpu")
    np.testing.assert_array_equal(gl[0], wg[0])
    np.testing.assert_array_equal(gl[1], wg[1])
    np.testing.assert_array_equal(gl[3], wg[3])
    assert not np.array_equal(gl[2], wg[2])

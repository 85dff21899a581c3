"""vtx pipeline plumbing: eligibility gate + slots ratchet (CPU-checkable)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vulkan_forge._raster import pipeline as P


def _grid_indices(n):
    from vulkan_forge import _mesh
    _xy, idx = _mesh.build_grid_xyuv(n)
    return jnp.asarray(np.asarray(idx).astype(np.int32).reshape(-1, 3))


def test_vtx_ok_gate():
    idx64 = _grid_indices(64)
    assert P._vtx_ok(64, idx64, 800, 600)
    assert not P._vtx_ok(None, idx64, 800, 600)          # not a grid mesh
    assert not P._vtx_ok(63, idx64, 800, 600)            # wrong grid_n
    # drop a triangle: topology no longer the full grid
    assert not P._vtx_ok(64, idx64[:-1], 800, 600)
    # accumulator planes must fit VMEM: huge framebuffer fails the gate
    assert not P._vtx_ok(64, idx64, 8192, 8192)
    # a ratchet past the two-window placement limit routes to packed
    P._VTX_RATCHET[(64, 800, 600)] = 256
    try:
        assert not P._vtx_ok(64, idx64, 800, 600)
    finally:
        P._VTX_RATCHET.pop((64, 800, 600), None)


def test_vtx_slots_ratchet():
    key = (97, 321, 243)                                  # unused elsewhere
    assert P._vtx_slots(*key) == 4                        # default
    P._vtx_bump(*key, needed=5.0)
    assert P._vtx_slots(*key) == 8                        # next pow2 >= 5
    P._vtx_bump(*key, needed=6.0)                         # never shrinks
    assert P._vtx_slots(*key) == 16                       # cur*2 floor
    P._vtx_bump(*key, needed=100.0)
    assert P._vtx_slots(*key) >= 100
    P._VTX_RATCHET.pop(key, None)                         # leave no state


def test_vtx_render_path_end_to_end(monkeypatch):
    """Drive render_terrain_u8 through VF_DENSE=vtx (interpret-mode kernel
    so this runs anywhere). Pixel bytes are compared loosely against the
    default path -- interpret carries XLA:CPU fma-contraction ulps; byte
    parity on hardware is pinned by tests/test_vtx_kernel.py. This test
    is about the PLUMBING: the jitted batch entry, the needed-slots host
    sync, the ratchet, and that a vtx-rendered frame is a real image."""
    import jax
    from vulkan_forge import _colormap, _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu

    grid, W, H = 40, 96, 72
    monkeypatch.setenv("VF_VTX_INTERPRET", "1")
    monkeypatch.setenv("VF_DENSE", "vtx")
    monkeypatch.setattr(P, "SEGMENT_THRESHOLD", 100)     # dense at tiny T
    monkeypatch.setitem(P._VTX_RATCHET, (grid, W, H), 8)

    xyuv, idx = _mesh.build_grid_xyuv(grid)
    heights = np.zeros((1, 1), np.float32)
    view = look_at_rh((3.0, 2.0, 3.0), (0, 0, 0), (0, 1, 0))
    proj = perspective_wgpu(np.float32(0.8), np.float32(W / H),
                            np.float32(0.1), np.float32(100.0))
    lut, _ = _colormap.build_lut("viridis")
    sun = np.array([0.3, 0.9, 0.3], np.float32)

    kw = dict(spacing=1.0, exaggeration=1.0, h_min=-0.5, h_max=0.5,
              exposure=1.0, sun_dir=sun, lut=lut, width=W, height=H,
              fs_mode="shipped", backend="pallas", grid_n=grid)
    img_vtx = P.render_terrain_u8(xyuv, idx, heights, view, proj, **kw)
    # the extended (fwd-diff normals + Reinhard) epilogue plumbs too
    img_ext = P.render_terrain_u8(xyuv, idx, heights, view, proj,
                                  **{**kw, "fs_mode": "extended"})
    assert img_ext.shape == (H, W, 4) and img_ext[..., 3].min() == 255
    monkeypatch.setenv("VF_DENSE", "packed")
    monkeypatch.setattr(P, "SEGMENT_THRESHOLD", 10**9)   # default path
    img_ref = P.render_terrain_u8(xyuv, idx, heights, view, proj,
                                  **{**kw, "backend": "jnp"})
    assert img_vtx.shape == img_ref.shape == (H, W, 4)
    # identical coverage; colors within a few 8-bit steps of the oracle
    same = (np.abs(img_vtx.astype(np.int32) - img_ref.astype(np.int32))
            <= 2).mean()
    assert same > 0.999, f"vtx path image diverges: {same}"

"""Fused-FS vtx kernel parity: in-kernel shading == gbuffer + XLA epilogue.

The fused kernel (vtx.render_image_vtx_batch) runs the shipped fragment
epilogue at resolve time on the VMEM-resident accumulator planes and
stores only the packed-u32 framebuffer. On TPU it must be BYTE-IDENTICAL
to the split path (render_gbuffer_vtx_batch + fragment.terrain_fs): every
op in fragment.terrain_fs_tile is bit-exact vs its XLA lowering
(measured: scripts/exp_fs_ops.py -- sin/cos/sqrt/pow exact; 1/sqrt is
rewritten to rsqrt by XLA, so the kernel calls lax.rsqrt explicitly).

In interpret mode (CPU) the raster core is exact but XLA:CPU may contract
1/sqrt differently, so the CPU test allows 1 u8 step on shade boundaries.
Match: /root/reference/src/shaders/terrain.wgsl:68-91 (one fused GPU
stage).
"""
from __future__ import annotations

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_tpu

from vulkan_forge import _colormap, _mesh
from vulkan_forge._camera import look_at_rh, perspective_wgpu
from vulkan_forge._raster import fragment, transform, vtx
from vulkan_forge._raster.setup import clip_to_fb


def _fields(grid, W, H, eye, B):
    xyuv_np, _idx = _mesh.build_grid_xyuv(grid)
    xyuv = jnp.asarray(xyuv_np)
    heights = jnp.zeros((1, 1), jnp.float32)
    view = jnp.asarray(look_at_rh(eye, (0, 0, 0), (0, 1, 0)))
    proj = jnp.asarray(perspective_wgpu(
        np.float32(math.radians(45.0)), np.float32(W / H),
        np.float32(0.1), np.float32(100.0)))
    clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                      jnp.float32(1.0), jnp.float32(1.0))
    x, y, z, w = clip_to_fb(clip, W, H)
    zero = jnp.zeros_like(x)
    fields = (x, y, w, vary[:, 0], vary[:, 1], vary[:, 2], z, zero)
    return tuple(jnp.broadcast_to(f, (B,) + f.shape) for f in fields)


def _both_paths(grid, W, H, slots, B, eye):
    fields_b = _fields(grid, W, H, eye, B)
    lut, _fmt = _colormap.build_lut("terrain")
    lut = jnp.asarray(lut)
    h_range = jnp.float32(1.0)
    exposure = jnp.float32(1.1)
    sun = jnp.asarray([0.35, 0.9, 0.2], jnp.float32)

    img_f, need_f = vtx.render_image_vtx_batch(
        fields_b, lut, h_range, exposure, sun, grid, W, H, slots=slots)
    (v0, v1, v2, m), need_s = vtx.render_gbuffer_vtx_batch(
        fields_b, grid, W, H, slots=slots)
    img_s = jax.vmap(
        lambda a, b, c, mk: fragment.terrain_fs(
            a, b, c, mk, lut, h_range, exposure, sun))(v0, v1, v2, m)
    img_f, need_f, img_s, need_s = jax.device_get(
        (img_f, need_f, img_s, need_s))
    assert float(need_f) <= slots, "config must fit the slot capacity"
    assert float(need_f) == float(need_s)
    return img_f, img_s


CONFIGS = [
    (48, 96, 64, 6, 1, (3.0, 2.0, 3.0)),
    (33, 117, 83, 8, 2, (2.0, 1.2, -2.5)),
    (12, 96, 64, 16, 1, (3.0, 2.0, 3.0)),     # hi-anchor stress
]


@requires_tpu
@pytest.mark.parametrize("grid,W,H,slots,B,eye", CONFIGS)
def test_fused_fs_byte_parity_tpu(grid, W, H, slots, B, eye):
    img_f, img_s = _both_paths(grid, W, H, slots, B, eye)
    assert np.array_equal(img_f, img_s), (
        int((img_f != img_s).sum()), "fused FS diverges from XLA epilogue")


def test_fused_fs_interpret_mode(monkeypatch):
    """Runs ANYWHERE: interpret-mode fused kernel vs the XLA epilogue,
    1 u8 tolerance (XLA:CPU's 1/sqrt contraction; see module docstring).
    On-TPU byte-exactness is the test above."""
    monkeypatch.setenv("VF_VTX_INTERPRET", "1")
    img_f, img_s = _both_paths(24, 64, 48, 8, 1, (3.0, 2.0, 3.0))
    a8 = img_f.view(np.uint8).astype(np.int32)
    b8 = img_s.view(np.uint8).astype(np.int32)
    assert int(np.abs(a8 - b8).max()) <= 1


def test_fuse_gate_respects_vmem_budget(monkeypatch):
    """The pipeline only routes to the fused kernel when six full-frame
    planes fit scoped VMEM; VF_VTX_FUSE_FS=0 must force the split path."""
    from vulkan_forge._raster import pipeline as P
    assert P._vtx_fuse_ok(800, 600)
    assert not P._vtx_fuse_ok(3840, 2160)   # 6 planes ~ 200 MB: never
    monkeypatch.setenv("VF_VTX_FUSE_FS", "0")
    assert not P._vtx_fuse_ok(96, 64)

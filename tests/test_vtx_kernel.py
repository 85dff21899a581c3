"""vtx kernel byte-parity vs the tile oracle (TPU; kernel-lowering path).

The vertex-stream kernel synthesizes triangle records in-kernel from the
shared setup_fields_core trace, so its gbuffer must match the jnp tile
oracle bit-for-bit whenever the frame fits the slot capacity (vtx.py
overflow contract). Configs cover the demand/clip gates: interior scenes
(clean cheap walk), odd framebuffers, a hi-anchor stress (big triangles,
slots=16), batch > 1, and a close-in camera that mixes cheap and spilled
walks.
"""
from __future__ import annotations

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_tpu

from vulkan_forge import _mesh
from vulkan_forge._camera import look_at_rh, perspective_wgpu
from vulkan_forge._raster import transform, vtx
from vulkan_forge._raster.setup import (bin_triangles, clip_to_fb,
                                        tile_counts, tile_span_max,
                                        triangle_setup)
from vulkan_forge._raster import tiles


def _spike(grid, W, H, eye):
    xyuv_np, idx_np = _mesh.build_grid_xyuv(grid)
    xyuv = jnp.asarray(xyuv_np)
    indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), jnp.float32)
    view = jnp.asarray(look_at_rh(eye, (0, 0, 0), (0, 1, 0)))
    proj = jnp.asarray(perspective_wgpu(
        np.float32(math.radians(45.0)), np.float32(W / H),
        np.float32(0.1), np.float32(100.0)))
    clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                      jnp.float32(1.0), jnp.float32(1.0))
    x, y, z, w = clip_to_fb(clip, W, H)
    return x, y, z, w, vary


def _oracle(x, y, z, w, vary, grid, W, H):
    _xy, idx_np = _mesh.build_grid_xyuv(grid)
    indices = jnp.asarray(np.asarray(idx_np).astype(np.int32).reshape(-1, 3))
    records, bbox = triangle_setup(x, y, z, w, vary, indices, W, H)
    cap = int(tile_counts(bbox, W, H).max())
    sx, sy = tile_span_max(bbox, W, H)
    binning = bin_triangles(bbox, W, H, max(cap, 8),
                            span_x=int(sx), span_y=int(sy))
    return tiles.render_gbuffer(records, binning.tile_lists, W, H)


CONFIGS = [
    (48, 96, 64, 6, 1, (3.0, 2.0, 3.0)),
    (33, 117, 83, 8, 2, (2.0, 1.2, -2.5)),
    (12, 96, 64, 16, 1, (3.0, 2.0, 3.0)),     # hi-anchor stress
    (64, 128, 96, 8, 1, (-1.2, 0.5, 1.4)),    # low camera, mixed gates
]


@requires_tpu
@pytest.mark.parametrize("grid,W,H,slots,B,eye", CONFIGS)
def test_vtx_gbuffer_byte_parity(grid, W, H, slots, B, eye):
    x, y, z, w, vary = _spike(grid, W, H, eye)
    ref = _oracle(x, y, z, w, vary, grid, W, H)

    zero = jnp.zeros_like(x)
    fields = (x, y, w, vary[:, 0], vary[:, 1], vary[:, 2], z, zero)
    fields_b = tuple(jnp.broadcast_to(f, (B,) + f.shape) for f in fields)
    (v0, v1, v2, m), needed = vtx.render_gbuffer_vtx_batch(
        fields_b, grid, W, H, slots=slots)
    got = jax.device_get((v0, v1, v2, m, needed))
    assert float(got[4]) <= slots, "config must fit the slot capacity"
    for b in range(B):
        for name, a, g in zip(("v0", "v1", "v2"), ref[:3], got[:3]):
            assert np.array_equal(np.asarray(a), g[b]), (name, b)
        assert np.array_equal(np.asarray(ref[3]), got[3][b]), ("mask", b)


def test_vtx_coverage_exact_in_interpret_mode(monkeypatch):
    """Structure check that runs ANYWHERE: the interpret-mode kernel's
    COVERAGE must match the tile oracle exactly (placement, winner
    resolution, demand/clip gates, walk ranges). Values are excluded --
    XLA:CPU fma contraction adds ulps there; hardware byte parity is the
    TPU tests above."""
    monkeypatch.setenv("VF_VTX_INTERPRET", "1")
    grid, W, H, slots = 24, 64, 48, 8
    x, y, z, w, vary = _spike(grid, W, H, (3.0, 2.0, 3.0))
    ref = _oracle(x, y, z, w, vary, grid, W, H)
    zero = jnp.zeros_like(x)
    fields_b = tuple(f[None] for f in (x, y, w, vary[:, 0], vary[:, 1],
                                       vary[:, 2], z, zero))
    (_v0, _v1, _v2, m), needed = vtx.render_gbuffer_vtx_batch(
        fields_b, grid, W, H, slots=slots)
    m, needed = jax.device_get((m[0], needed))
    assert float(needed) <= slots
    assert np.array_equal(np.asarray(ref[3]), m), "coverage diverges"


@requires_tpu
def test_vtx_overflow_reports_honestly():
    """A camera demanding more slots than provided must report
    needed > slots (the caller's cue to re-render through packed)."""
    grid, W, H = 12, 96, 64
    x, y, z, w, vary = _spike(grid, W, H, (3.0, 2.0, 3.0))
    zero = jnp.zeros_like(x)
    fields_b = tuple(f[None] for f in (x, y, w, vary[:, 0], vary[:, 1],
                                       vary[:, 2], z, zero))
    _imgs, needed = vtx.render_gbuffer_vtx_batch(fields_b, grid, W, H,
                                                 slots=4)
    assert float(jax.device_get(needed)) > 4

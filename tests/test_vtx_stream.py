"""Vertex-stream prep invariants (vtx.build_vtx_stream), CPU-checkable.

The vtx kernel trusts the stamped chunk metadata for two guarantees:

1. WALK COVERAGE: every tile containing a covered pixel of any triangle
   in a (cell-row, chunk) lies inside the stamped (ty0, ntr, c0, ncl)
   walk window.
2. SLOT DEMAND: the stamped span (meta lane 4) is >= the kernel's
   span+2 overflow metric for every triangle in the chunk, so the
   base-slot demand gate can never under-walk a triangle (including the
   right-edge clip case where both px1 values snap to width-1).

These are prep-side contracts, independent of the Pallas kernel, so they
are pinned here against the XLA triangle_setup truth on random cameras.
Kernel byte-parity itself is pinned by scripts/dev_vtx.py on hardware.
"""
from __future__ import annotations

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vulkan_forge import _mesh
from vulkan_forge._camera import look_at_rh, perspective_wgpu
from vulkan_forge._raster import transform, vtx
from vulkan_forge._raster.setup import clip_to_fb, triangle_setup


def _spike_fields(grid, W, H, eye):
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
    return x, y, z, w, vary, indices


CONFIGS = [
    (24, 96, 64, (3.0, 2.0, 3.0)),
    (33, 117, 83, (2.0, 1.2, -2.5)),       # odd framebuffer
    (48, 128, 96, (-1.8, 0.7, 1.9)),       # low camera, big spans
    (17, 64, 48, (0.9, 0.4, 0.9)),         # close-in: edge clipping
]


@pytest.mark.parametrize("grid,W,H,eye", CONFIGS)
def test_meta_contains_truth(grid, W, H, eye):
    x, y, z, w, vary, indices = _spike_fields(grid, W, H, eye)
    _records, bbox = triangle_setup(x, y, z, w, vary, indices, W, H)
    bbox = np.asarray(bbox)

    zero = jnp.zeros_like(x)
    fields = (x, y, w, vary[:, 0], vary[:, 1], vary[:, 2], z, zero)
    stream = np.asarray(vtx.build_vtx_stream(fields, grid, W, H))

    n = grid
    cells = n - 1
    nch = vtx._nch(n)
    rb = (nch + 1) * 8
    meta = stream.reshape(n, nch + 1, 8, 128)[:, nch]    # (n, 8, 128)
    assert stream.shape == (n * rb, 128)

    for t in range(bbox.shape[0]):
        px0, px1, py0, py1 = bbox[t]
        if px1 < px0 or py1 < py0:
            continue                                     # culled
        cell = t // 2
        r, c = cell // cells, cell % cells
        kx = c // 128
        ty0, ntr, c0, ncl, spanc = meta[r, kx, :5]
        # walk window contains the true tile range
        assert ty0 <= py0 // 8 and py1 // 8 < ty0 + ntr, \
            f"tri {t}: ty [{py0//8},{py1//8}] outside [{ty0},{ty0+ntr})"
        assert c0 <= px0 // 128 and px1 // 128 < c0 + ncl, \
            f"tri {t}: col [{px0//128},{px1//128}] outside [{c0},{c0+ncl})"
        # stamped slot demand covers the kernel's span+2 overflow metric
        assert spanc >= (px1 - px0 + 2), \
            f"tri {t}: span {px1 - px0 + 2} > stamped {spanc}"


def test_meta_unclean_cells_fullscreen():
    """Cells touching w <= eps must stamp full-screen walk ranges (their
    vertex extents are meaningless under a projective sign flip)."""
    grid, W, H = 9, 64, 48
    x, y, z, w, vary, indices = _spike_fields(grid, W, H, (0.2, 0.05, 0.2))
    w = w.at[40].set(jnp.float32(1e-9))                  # force an unclean vert
    zero = jnp.zeros_like(x)
    fields = (x, y, w, vary[:, 0], vary[:, 1], vary[:, 2], z, zero)
    stream = np.asarray(vtx.build_vtx_stream(fields, grid, W, H))
    n = grid
    nch = vtx._nch(n)
    meta = stream.reshape(n, nch + 1, 8, 128)[:, nch]
    r, c = 40 // grid, 40 % grid
    nty, ntx = -(-H // 8), -(-W // 128)
    for rr in (r - 1, r):                                # cells touching vert
        if 0 <= rr < grid - 1:
            ty0, ntr, c0, ncl, spanc = meta[rr, c // 128, :5]
            assert ty0 == 0 and ntr == nty
            assert c0 == 0 and ncl == ntx
            assert spanc >= W                            # demands overflow


def test_meta_clean_stamp():
    """Clip-clean stamp (lane 5): interior scenes stamp 1 everywhere; a
    chunk containing a w<=eps or out-of-[0,1]-z vertex stamps 0."""
    grid, W, H = 24, 96, 64
    x, y, z, w, vary, indices = _spike_fields(grid, W, H, (3.0, 2.0, 3.0))
    zero = jnp.zeros_like(x)

    def meta_of(wv, zv):
        fields = (x, y, wv, vary[:, 0], vary[:, 1], vary[:, 2], zv, zero)
        stream = np.asarray(vtx.build_vtx_stream(fields, grid, W, H))
        nch = vtx._nch(grid)
        return stream.reshape(grid, nch + 1, 8, 128)[:, nch]

    clean = meta_of(w, z)[:grid - 1, 0, 5]
    assert np.all(clean == 1.0), "interior spike scene must be clip-clean"

    w_bad = w.at[40].set(jnp.float32(1e-9))
    dirty = meta_of(w_bad, z)[:grid - 1, 0, 5]
    r = 40 // grid
    for rr in (r - 1, r):
        if 0 <= rr < grid - 1:
            assert dirty[rr] == 0.0, "w<=eps vertex must dirty its rows"

    z_bad = z.at[100].set(jnp.float32(1.5))            # past far plane
    dirty_z = meta_of(w, z_bad)[:grid - 1, 0, 5]
    r2 = 100 // grid
    for rr in (r2 - 1, r2):
        if 0 <= rr < grid - 1:
            assert dirty_z[rr] == 0.0, "z>1 vertex must dirty its rows"


def test_stream_field_layout():
    """Vertex row r chunk kx lives at rows ((r*(nch+1))+kx)*8..+8, with
    sublane f = field f of 128 consecutive verts."""
    grid, W, H = 12, 64, 48
    n = grid
    rng = np.random.default_rng(7)
    fields = tuple(jnp.asarray(rng.standard_normal(n * n).astype(np.float32))
                   for _ in range(vtx.FLD))
    stream = np.asarray(vtx.build_vtx_stream(fields, n, W, H))
    nch = vtx._nch(n)
    for r in (0, 5, n - 1):
        for f in (0, 3, 7):
            row = (r * (nch + 1) + 0) * 8 + f
            want = np.asarray(fields[f]).reshape(n, n)[r, :n]
            got = stream[row, :n]
            assert np.array_equal(got, want), (r, f)

"""Hardware fill-rule oracle (fixed-point, top-left) vs the shipped
all-edges-inclusive f32 rule: watertightness of the oracle itself, and a
quantified bound on the delta (SURVEY.md section 7 "+-1 LSB parity" /
VERDICT round-1 item 8).

The shipped rule is deterministic (max-id painter) but can cover a
shared-edge pixel from both triangles where hardware picks exactly one;
these tests pin that (a) every such difference lies ON a coverage/winner
boundary, and (b) interior pixels agree bit-for-bit in coverage and to
float tolerance in attributes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vulkan_forge._raster import hw_oracle, tiles
from vulkan_forge._raster.setup import (bin_triangles, clip_to_fb,
                                        tile_counts, tile_span_max,
                                        triangle_setup)

W, H = 128, 96


def _render_ours(clip, attrs, indices):
    with jax.default_device(jax.devices("cpu")[0]):
        x, y, z, w = clip_to_fb(jnp.asarray(clip, jnp.float32), W, H)
        records, bbox = triangle_setup(
            x, y, z, w, jnp.asarray(attrs, jnp.float32),
            jnp.asarray(indices, jnp.int32), W, H)
        cmax = int(tile_counts(bbox, W, H).max())
        sx, sy = tile_span_max(bbox, W, H)
        binning = bin_triangles(bbox, W, H, max(cmax, 8),
                                span_x=int(sx), span_y=int(sy))
        v0, v1, v2, mask = tiles.render_gbuffer(
            records, binning.tile_lists, W, H)
        return (np.asarray(v0), np.asarray(v1), np.asarray(v2),
                np.asarray(mask))


def _boundary(img):
    p = np.pad(img, 1, mode="edge")
    m = np.zeros(img.shape, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            m |= p[1 + dy:H + 1 + dy, 1 + dx:W + 1 + dx] != img
    return m


def test_hw_oracle_watertight_quad():
    """Two triangles tiling a quad: every interior pixel covered EXACTLY
    once -- the defining property of the top-left rule. The shared
    diagonal passes exactly through pixel centers (45 degrees through
    integer+0.5 corners) to force ties."""
    # quad corners in NDC hitting exact pixel centers
    def ndc(px, py):
        return (2 * (px + 0.5) / W - 1, 1 - 2 * (py + 0.5) / H)

    quad = [ndc(10, 10), ndc(70, 10), ndc(70, 70), ndc(10, 70)]
    clip = np.array([[x, y, 0.5, 1.0] for x, y in quad])
    attrs = np.ones((4, 3))
    # CCW in wgpu terms (front): note y-down flip
    indices = np.array([[0, 2, 1], [0, 3, 2]], np.int32)

    cover_count = np.zeros((H, W), np.int32)
    for tri in indices:
        wid1, _ = hw_oracle.rasterize_hw(clip, attrs, tri[None], W, H)
        cover_count += (wid1 >= 0).astype(np.int32)

    assert cover_count.max() <= 1, "double coverage: fill rule not watertight"
    # interior must be exactly 1 (no cracks along the shared diagonal)
    interior = np.zeros((H, W), bool)
    interior[12:69, 12:69] = True
    # pixels strictly inside the quad
    assert (cover_count[interior] == 1).all(), "crack inside the quad"
    # and the shared diagonal must not be double-painted
    wid_all, _ = hw_oracle.rasterize_hw(clip, attrs, indices, W, H)
    assert ((wid_all >= 0) == (cover_count == 1)).all()


def test_hw_oracle_watertight_fan():
    """A randomized fan of triangles tiling a convex polygon: no pixel
    covered twice, none missed strictly inside."""
    rng = np.random.default_rng(7)
    n = 7
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(0.4, 0.9, n)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], 1)
    clip = np.concatenate(
        [np.zeros((1, 2)), pts]).astype(np.float64)
    clip = np.concatenate(
        [clip, np.full((n + 1, 1), 0.3), np.ones((n + 1, 1))], axis=1)
    attrs = np.ones((n + 1, 3))
    tris = []
    for i in range(n):
        # center, k+1, k: y-down flip makes this the front winding
        tris.append([0, 1 + (i + 1) % n, 1 + i])
    indices = np.array(tris, np.int32)

    count = np.zeros((H, W), np.int32)
    for tri in indices:
        wid1, _ = hw_oracle.rasterize_hw(clip, attrs, tri[None], W, H)
        count += (wid1 >= 0).astype(np.int32)
    assert count.max() <= 1, "fan edges double-covered"


@pytest.mark.parametrize("seed", [0, 1])
def test_shipped_rule_delta_vs_hw_is_boundary_only(seed):
    """Random small-triangle soup: coverage/winner may differ from the
    hardware rule only ON boundaries (shared edges, silhouette); interior
    agreement is exact and attributes match to f32 tolerance."""
    rng = np.random.default_rng(seed)
    n = 40
    centers = rng.uniform([-0.9, -0.9], [0.9, 0.9], (n, 2))
    offs = rng.standard_normal((n, 3, 2)) * 0.25
    v = (centers[:, None, :] + offs).reshape(-1, 2)
    z = rng.uniform(0.1, 0.9, (n * 3, 1))
    wc = np.ones((n * 3, 1))
    clip = np.concatenate([v * wc, z * wc, wc], axis=1)
    attrs = np.stack([
        np.repeat(np.arange(n), 3).astype(np.float64),
        rng.uniform(-3, 3, n * 3),
        rng.uniform(-3, 3, n * 3)], axis=1)
    indices = np.arange(n * 3, dtype=np.int32).reshape(-1, 3)

    hw_id, hw_attr = hw_oracle.rasterize_hw(clip, attrs, indices, W, H)
    v0, v1, v2, mask = _render_ours(clip, attrs, indices)
    our_id = np.where(mask, np.rint(v0), -1).astype(np.int32)

    diff = our_id != hw_id
    onb = _boundary(hw_id) | _boundary(our_id)
    off_boundary = diff & ~onb
    assert off_boundary.sum() == 0, (
        f"{off_boundary.sum()} non-boundary fill-rule mismatches")

    agree = (our_id == hw_id) & (hw_id >= 0) & ~onb
    assert agree.sum() > 200
    # attribute sanity: the oracle interpolates from 1/256-SNAPPED vertex
    # positions (as hardware does), ours from unsnapped f32 -- a real,
    # bounded difference, not a rounding bug.
    np.testing.assert_allclose(v1[agree], hw_attr[agree][:, 1],
                               rtol=3e-2, atol=5e-3)
    np.testing.assert_allclose(v2[agree], hw_attr[agree][:, 2],
                               rtol=3e-2, atol=5e-3)
    # Quantified delta: the boundary disagreement is a tiny fraction of
    # covered area (documented bound for the "+-1 LSB" story).
    covered = (hw_id >= 0).sum()
    assert diff.sum() <= 0.06 * covered, (
        f"fill-rule delta too large: {diff.sum()}/{covered}")


def test_hw_fill_rule_routes_dense_to_strips(monkeypatch):
    """VF_FILL_RULE=hw on a dense grid mesh must route to the strips
    backend (the one dense kernel whose records carry the 8.8 top-left
    bias columns -- docs/PARITY.md), never the resident/vtx/packed
    streams, regardless of VF_DENSE. Formalizes the VERDICT r4 item-8
    story: strips IS the hw-rule dense backend.

    Match: /root/reference/src/terrain/pipeline.rs:107-140 (the
    fixed-function rule is unconditional on the GPU; here it is a mode
    every dense render must honor).
    """
    import math

    from vulkan_forge import _colormap, _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    from vulkan_forge._raster import pipeline as P

    hits = []

    def spy(name, ret=None):
        def f(*a, **k):
            hits.append(name)
            if ret is not None:
                return ret
            raise AssertionError(f"{name} must not run under hw rule")
        return f

    monkeypatch.setattr(P, "_terrain_render_batch_resident",
                        spy("resident"))
    monkeypatch.setattr(P, "_terrain_render_batch_vtx", spy("vtx"))
    monkeypatch.setattr(P, "_terrain_render_batch_packed", spy("packed"))
    monkeypatch.setattr(P, "_terrain_render_batch_packed_split",
                        spy("packed_split"))
    monkeypatch.setattr(
        P, "_terrain_render_strips",
        spy("strips", ret=jnp.zeros((120, 160), jnp.uint32)))

    grid = 104                                  # T = 21218 > threshold
    xyuv, idx = _mesh.build_grid_xyuv(grid)
    lut, _ = _colormap.build_lut("terrain")
    kw = dict(spacing=1.0, exaggeration=1.0, h_min=0.0, h_max=1.0,
              exposure=1.0, sun_dir=(0.3, 0.9, 0.3), lut=lut,
              width=160, height=120, backend="pallas",
              row_size=2 * (grid - 1), grid_n=grid)
    view = look_at_rh((3, 2, 3), (0, 0, 0), (0, 1, 0))
    proj = perspective_wgpu(np.float32(math.radians(45)),
                            np.float32(160 / 120), np.float32(0.1),
                            np.float32(100))

    monkeypatch.setenv("VF_FILL_RULE", "hw")
    for dense in (None, "vtx", "packed", "resident"):
        if dense is None:
            monkeypatch.delenv("VF_DENSE", raising=False)
        else:
            monkeypatch.setenv("VF_DENSE", dense)
        hits.clear()
        img = P.render_terrain_u8(
            xyuv, idx.reshape(-1, 3), np.zeros((1, 1), np.float32),
            view, proj, **kw)
        assert hits == ["strips"], f"VF_DENSE={dense}: routed {hits}"
        assert img.shape == (120, 160, 4)

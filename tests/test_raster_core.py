"""Raster core unit tests: backends agree byte-exactly, winding/cull rules,
binning determinism, sRGB curves. These are the TPU analog of the
reference's cross-backend identity checks (python/tools/backends_runner.py).
"""
import hashlib

import numpy as np
import pytest

import vulkan_forge as vf
from vulkan_forge._raster import pipeline

from conftest import requires_tpu


@requires_tpu
def test_triangle_backends_identical():
    a = pipeline.render_triangle_u8(96, 64, backend="jnp")
    b = pipeline.render_triangle_u8(96, 64, backend="pallas")
    np.testing.assert_array_equal(a, b)


@requires_tpu
def test_terrain_backends_identical(monkeypatch):
    h = (np.outer(np.linspace(0, 1, 32), np.linspace(0, 1, 32))).astype(np.float32)
    imgs = {}
    for be in ("jnp", "pallas"):
        monkeypatch.setenv("VF_BACKEND", be)
        s = vf.Scene(160, 120, 32, "terrain")
        s.set_height_from_r32f(h)
        imgs[be] = s.render_rgba()
    np.testing.assert_array_equal(imgs["jnp"], imgs["pallas"])


@requires_tpu
def test_segment_backend_identical(monkeypatch):
    # Force the round-1 segment-walk kernel (tall-framebuffer fallback) on a
    # small scene and compare byte-for-byte against the jnp oracle.
    monkeypatch.setattr(pipeline, "SEGMENT_THRESHOLD", 1)
    monkeypatch.setattr(pipeline, "_strips_fit", lambda h: False)
    monkeypatch.setenv("VF_BACKEND", "pallas")
    s1 = vf.Scene(160, 120, 32, "viridis")
    seg_img = s1.render_rgba()
    monkeypatch.setenv("VF_BACKEND", "jnp")
    s2 = vf.Scene(160, 120, 32, "viridis")
    ref_img = s2.render_rgba()
    np.testing.assert_array_equal(seg_img, ref_img)


@requires_tpu
def test_segment_backend_forced_column_major_identical(monkeypatch):
    # Regression: the axis-adaptive (column-major) walk must gather each
    # permuted stream position's record from its ORIGINAL row; a mismatch
    # renders wrong triangles (round-1 advisor finding). Force the perm
    # branch regardless of the work estimates and compare to the oracle.
    # (_strips_fit is forced off so the tall-framebuffer segment fallback
    # path stays covered now that strips is the default dense path.)
    monkeypatch.setattr(pipeline, "SEGMENT_THRESHOLD", 1)
    monkeypatch.setattr(pipeline, "_strips_fit", lambda h: False)
    monkeypatch.setattr(pipeline, "_segment_axis_estimate",
                        lambda *a, **k: (np.float32(2.0), np.float32(1.0)))
    monkeypatch.setenv("VF_BACKEND", "pallas")
    h = (np.outer(np.sin(np.linspace(0, 3, 32)),
                  np.cos(np.linspace(0, 2, 32)))).astype(np.float32)
    s1 = vf.Scene(160, 120, 32, "magma")
    s1.set_height_from_r32f(h)
    seg_img = s1.render_rgba()
    monkeypatch.setenv("VF_BACKEND", "jnp")
    s2 = vf.Scene(160, 120, 32, "magma")
    s2.set_height_from_r32f(h)
    np.testing.assert_array_equal(seg_img, s2.render_rgba())


@requires_tpu
def test_strip_backend_identical(monkeypatch):
    # The strip-walk kernel (round-2 dense-mesh default) must match the jnp
    # oracle byte-for-byte through the Scene API.
    monkeypatch.setattr(pipeline, "SEGMENT_THRESHOLD", 1)
    monkeypatch.setenv("VF_BACKEND", "pallas")
    h = (np.outer(np.cos(np.linspace(0, 4, 32)),
                  np.sin(np.linspace(0, 3, 32)))).astype(np.float32)
    s1 = vf.Scene(160, 120, 32, "terrain")
    s1.set_height_from_r32f(h)
    strip_img = s1.render_rgba()
    monkeypatch.setenv("VF_BACKEND", "jnp")
    s2 = vf.Scene(160, 120, 32, "terrain")
    s2.set_height_from_r32f(h)
    np.testing.assert_array_equal(strip_img, s2.render_rgba())


@requires_tpu
def test_packed_backend_identical(monkeypatch):
    # The packed-stream kernel (round-3 dense-mesh default, 128 B/tri)
    # must match the jnp oracle byte-for-byte through the Scene API.
    monkeypatch.setattr(pipeline, "SEGMENT_THRESHOLD", 1)
    monkeypatch.setenv("VF_DENSE", "packed")
    monkeypatch.setenv("VF_BACKEND", "pallas")
    h = (np.outer(np.cos(np.linspace(0, 4, 32)),
                  np.sin(np.linspace(0, 3, 32)))).astype(np.float32)
    s1 = vf.Scene(160, 120, 32, "terrain")
    s1.set_height_from_r32f(h)
    packed_img = s1.render_rgba()
    monkeypatch.setenv("VF_BACKEND", "jnp")
    s2 = vf.Scene(160, 120, 32, "terrain")
    s2.set_height_from_r32f(h)
    np.testing.assert_array_equal(packed_img, s2.render_rgba())


@requires_tpu
def test_hw_fill_rule_backends_identical(monkeypatch):
    # VF_FILL_RULE=hw must produce identical pixels on the pallas backends
    # (list kernel; strips for dense routes) and the jnp oracle.
    h = (np.outer(np.sin(np.linspace(0, 2, 32)),
                  np.cos(np.linspace(0, 3, 32)))).astype(np.float32)
    monkeypatch.setenv("VF_FILL_RULE", "hw")
    imgs = {}
    for be in ("jnp", "pallas"):
        monkeypatch.setenv("VF_BACKEND", be)
        s = vf.Scene(160, 120, 32, "viridis")
        s.set_height_from_r32f(h)
        imgs[be] = s.render_rgba()
    np.testing.assert_array_equal(imgs["jnp"], imgs["pallas"])
    # dense route (strips kernel carries the bias columns)
    monkeypatch.setattr(pipeline, "SEGMENT_THRESHOLD", 1)
    monkeypatch.setenv("VF_BACKEND", "pallas")
    s = vf.Scene(160, 120, 32, "viridis")
    s.set_height_from_r32f(h)
    np.testing.assert_array_equal(imgs["jnp"], s.render_rgba())
    # and the rule actually differs from the shipped inclusive rule
    monkeypatch.setenv("VF_FILL_RULE", "inclusive")
    monkeypatch.setenv("VF_BACKEND", "jnp")
    monkeypatch.setattr(pipeline, "SEGMENT_THRESHOLD", 200_000)
    s2 = vf.Scene(160, 120, 32, "viridis")
    s2.set_height_from_r32f(h)
    assert not np.array_equal(imgs["jnp"], s2.render_rgba())


@requires_tpu
def test_strips_batch_matches_single():
    # Batched strip path (one pallas_call for B frames) must equal B
    # single-frame renders exactly.
    import math
    import jax
    import jax.numpy as jnp
    from vulkan_forge import _camera, _colormap, _mesh

    GRID, W, H = 24, 256, 96
    xyuv, idx = _mesh.build_grid_xyuv(GRID)
    xyuv = jnp.asarray(xyuv)
    indices = jnp.asarray(np.asarray(idx).astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), jnp.float32)
    lut = jnp.asarray(_colormap.build_lut("viridis")[0])
    sun = jnp.asarray(np.array([0.5, 1.0, 0.3], np.float32)
                      / np.linalg.norm([0.5, 1.0, 0.3]))
    views, projs = [], []
    for i in range(2):
        ang = 0.7 + i
        views.append(_camera.look_at_rh(
            (3 * math.cos(ang), 2.0, 3 * math.sin(ang)), (0, 0, 0), (0, 1, 0)))
        projs.append(_camera.perspective_wgpu(
            np.float32(math.radians(45.0)), np.float32(W / H),
            np.float32(0.1), np.float32(100.0)))
    views = jnp.asarray(np.stack(views))
    projs = jnp.asarray(np.stack(projs))
    com = (jnp.float32(-0.5), jnp.float32(0.5), jnp.float32(1.0), sun,
           jnp.float32(1.0), jnp.float32(1.0))
    rs = 2 * (GRID - 1)
    batch = pipeline._terrain_render_batch_strips(
        xyuv, indices, heights, views, projs, lut, *com, W, H, rs)
    for i in range(2):
        records, bbox = pipeline._terrain_records(
            xyuv, indices, heights, views[i], projs[i], com[4], com[5], W, H)
        single = pipeline._terrain_render_strips(
            records, bbox, heights, lut, *com[:4], com[4], com[5], W, H, rs)
        np.testing.assert_array_equal(np.asarray(batch[i]),
                                      np.asarray(single))


@requires_tpu
def test_segment_exact_ids_identical():
    # The split (hi, lo) painter compare used for T >= 2^24 must paint
    # byte-identically to the single-f32-id path on any scene.
    import jax
    import jax.numpy as jnp
    from vulkan_forge._raster import segments as seg
    from vulkan_forge._raster import transform
    from vulkan_forge._raster.setup import clip_to_fb, triangle_setup
    from vulkan_forge import _mesh, _camera

    xyuv, idx = _mesh.build_grid_xyuv(24)
    xyuv = jnp.asarray(xyuv)
    indices = jnp.asarray(np.asarray(idx).astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), jnp.float32)
    view = jnp.asarray(_camera.look_at_rh((3, 2, 3), (0, 0, 0), (0, 1, 0)))
    proj = jnp.asarray(_camera.perspective_wgpu(
        np.float32(np.radians(45.0)), np.float32(160 / 120),
        np.float32(0.1), np.float32(100.0)))
    clip, varyings = transform.terrain_vs(xyuv, heights, view, proj,
                                          jnp.float32(1.0), jnp.float32(1.0))
    x, y, _z, w = clip_to_fb(clip, 160, 120)
    records, bbox = triangle_setup(x, y, _z, w, varyings, indices, 160, 120)
    cap = 2048
    crec, _ = seg.compact_valid(records, bbox, cap)
    sb = seg.segment_bin(bbox, 160, 120, row_size=2 * 23)

    outs = {}
    for exact in (False, True):
        outs[exact] = [np.asarray(a) for a in jax.jit(
            lambda r, s: seg.render_gbuffer_segments(
                r, s, 160, 120, exact_ids=exact))(crec, sb)]
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a, b)


def test_triangle_golden_properties():
    img = pipeline.render_triangle_u8(256, 256)
    # Clear is white (src/lib.rs:19) and the sRGB encode of 1.0 is 255.
    assert np.all(img[0, :] == 255)
    assert np.all(img[:, 0] == 255)
    # Alpha is 1 everywhere.
    assert np.all(img[..., 3] == 255)
    # Vertex colors: v0 red at bottom-left, v1 green at bottom-right,
    # v2 blue at top-center (NDC y up => framebuffer y down).
    h, w = 256, 256
    bl = img[int(0.9 * h) - 3, int(0.1 * w) + 3]
    br = img[int(0.9 * h) - 3, int(0.9 * w) - 3]
    tc = img[int(0.1 * h) + 3, w // 2]
    assert bl[0] > bl[1] and bl[0] > bl[2]   # red corner
    assert br[1] > br[0] and br[1] > br[2]   # green corner
    assert tc[2] > tc[0] and tc[2] > tc[1]   # blue apex
    # Roughly symmetric in x (red/green corners mirror).
    mid = img[h // 2]
    np.testing.assert_allclose(mid[:, 0].astype(int),
                               mid[::-1, 1].astype(int), atol=2)


def test_backface_culling():
    # Reversing the winding of the fixed triangle must cull it entirely:
    # front_face=CCW + cull_mode=Back (src/lib.rs:120-121).
    import jax.numpy as jnp
    from vulkan_forge._raster import fragment, tiles, transform
    from vulkan_forge._raster.setup import bin_triangles, clip_to_fb, triangle_setup

    pos = jnp.asarray(pipeline._TRI_POS)
    col = jnp.asarray(pipeline._TRI_COLOR)
    clip, colors = transform.triangle_vs(pos, col)
    x, y, _z, w = clip_to_fb(clip, 64, 64)
    rev = jnp.array([[0, 2, 1]], jnp.int32)  # flipped winding
    records, bbox = triangle_setup(x, y, _z, w, colors, rev, 64, 64)
    binning = bin_triangles(bbox, 64, 64, capacity=8)
    v0, v1, v2, mask = tiles.render_gbuffer(records, binning.tile_lists, 64, 64)
    assert not bool(np.asarray(mask).any())


@requires_tpu
def test_adjacent_triangles_no_cracks_no_overdraw_gaps():
    # Two triangles sharing a diagonal must cover every pixel of the quad
    # interior with no holes (watertightness along the shared edge).
    import jax.numpy as jnp
    from vulkan_forge._raster import tiles, transform
    from vulkan_forge._raster.setup import bin_triangles, clip_to_fb, triangle_setup

    quad = jnp.array([[-0.9, -0.9], [0.9, -0.9], [-0.9, 0.9], [0.9, 0.9]],
                     jnp.float32)
    cols = jnp.ones((4, 3), jnp.float32)
    clip, colors = transform.triangle_vs(quad, cols)
    x, y, _z, w = clip_to_fb(clip, 128, 128)
    # CCW in NDC: (0,1,2) and (2,1,3)
    idx = jnp.array([[0, 1, 2], [2, 1, 3]], jnp.int32)
    records, bbox = triangle_setup(x, y, _z, w, colors, idx, 128, 128)
    # Screen-sized triangles: span must cover the whole tile grid (the
    # production paths size spans from tile_span_max).
    binning = bin_triangles(bbox, 128, 128, capacity=8, span_x=1, span_y=16)
    _, _, _, mask = tiles.render_gbuffer(records, binning.tile_lists, 128, 128)
    m = np.asarray(mask)
    # interior of the quad: fb x in [~6.4, ~121.6] -> rows/cols 7..121
    assert m[7:121, 7:121].all()
    assert not m[0:5, :].any() and not m[:, 0:5].any()


def test_binning_counts_and_order():
    import jax.numpy as jnp
    from vulkan_forge._raster.setup import bin_triangles, tile_counts

    # Three bboxes: one in tile (0,0), one spanning two x-tiles, one invalid.
    bbox = jnp.array([
        [0, 10, 0, 3],        # tile (0,0) only
        [120, 140, 0, 3],     # tiles (0,0) and (0,1) with tile_w=128
        [256, -1, 8, -1],     # empty (culled) encoding
    ], jnp.int32)
    counts = tile_counts(bbox, width=256, height=16)
    b = bin_triangles(bbox, width=256, height=16, capacity=8)
    counts = np.asarray(counts)
    lists = np.asarray(b.tile_lists)
    assert counts[0] == 2 and counts[1] == 1
    assert lists[0, 0] == 0 and lists[0, 1] == 1   # ascending ids
    assert lists[1, 0] == 1
    assert np.all(lists[0, 2:] == 3)               # sentinel = T


def test_srgb_curves_match_reference_constants():
    from vulkan_forge._formats import srgb_decode_np, srgb_encode_np, to_u8_np
    x = np.linspace(0, 1, 1024, dtype=np.float32)
    # decode(encode(x)) == x to fp precision
    np.testing.assert_allclose(srgb_decode_np(srgb_encode_np(x)), x, atol=2e-6)
    # Known anchor: linear 0.5 encodes to ~188/255
    assert to_u8_np(srgb_encode_np(np.float32(0.5))) == 188
    # Clear colors as stored by the sRGB target
    assert to_u8_np(srgb_encode_np(np.float32(0.02))) == 39
    assert to_u8_np(srgb_encode_np(np.float32(0.03))) == 48


def test_clear_color_pixels_exact():
    s = vf.Scene(64, 48, grid=4)
    img = s.render_rgba()
    # Top rows are background: sRGB-encoded (0.02, 0.02, 0.03, 1).
    assert tuple(img[0, 0]) == (39, 39, 48, 255)


def test_lut_bilinear_vs_cpu_reference():
    import jax.numpy as jnp
    from vulkan_forge._colormap import build_lut
    from vulkan_forge._raster.fragment import sample_lut_bilinear

    lut, _ = build_lut("viridis")
    t = np.linspace(0, 1, 97, dtype=np.float32)
    got = np.asarray(sample_lut_bilinear(jnp.asarray(lut), jnp.asarray(t)))

    # CPU reference of clamp-to-edge bilinear filtering on a 256x1 texture.
    xf = t * 256.0 - 0.5
    x0 = np.floor(xf)
    frac = (xf - x0)[:, None]
    i0 = np.clip(x0, 0, 255).astype(int)
    i1 = np.clip(x0 + 1, 0, 255).astype(int)
    ref = lut[i0] * (1 - frac) + lut[i1] * frac
    np.testing.assert_allclose(got, ref, atol=1e-6)


@requires_tpu
def test_segment_dma_alignment_adversarial():
    """Adversarial cover for the segment kernel's DMA-start down-alignment
    (segments.py seg_params): a PERMUTED stream whose per-row intervals
    start at every alignment offset 0..7, with the stream's maximum
    original ids sitting exactly at block boundaries, must still paint
    byte-identically to the jnp oracle (re-read leading triangles are
    rejected by coverage or idempotent under the max-id merge)."""
    import jax
    import jax.numpy as jnp
    from vulkan_forge._raster import segments as seg
    from vulkan_forge._raster import tiles
    from vulkan_forge._raster.setup import (bin_triangles, clip_to_fb,
                                            tile_counts, tile_span_max,
                                            triangle_setup)

    W, H = 256, 96
    rng = np.random.default_rng(11)
    n = 257                                   # odd: every alignment hit
    centers = rng.uniform([-0.9, -0.9], [0.9, 0.9], (n, 2))
    offs = rng.standard_normal((n, 3, 2)) * 0.15
    v = (centers[:, None, :] + offs).reshape(-1, 2)
    clip = np.concatenate([v, np.full((n * 3, 1), 0.4),
                           np.ones((n * 3, 1))], axis=1).astype(np.float32)
    attrs = np.stack([np.repeat(np.arange(n, dtype=np.float32), 3),
                      rng.uniform(-2, 2, n * 3).astype(np.float32),
                      rng.uniform(-2, 2, n * 3).astype(np.float32)], axis=1)
    indices = np.arange(n * 3, dtype=np.int32).reshape(-1, 3)

    x, y, z, w = clip_to_fb(jnp.asarray(clip), W, H)
    records, bbox = triangle_setup(x, y, z, w, jnp.asarray(attrs),
                                   jnp.asarray(indices), W, H)

    # permute the stream so ids are shuffled across DMA blocks (duplicate
    # max-id-at-block-edge shapes arise naturally from the shuffle)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    pbbox = bbox[perm]
    cap = int(jax.device_get(jnp.sum(
        (pbbox[:, 1] >= pbbox[:, 0]).astype(np.int32))))
    cap = max(8, -(-cap // 8) * 8)
    crecords, _ = seg.compact_valid(records, pbbox, cap, ids=perm)
    sb = seg.segment_bin(pbbox, W, H, row_size=24)   # odd intervals
    v0s, v1s, v2s, ms = seg.render_gbuffer_segments(crecords, sb, W, H)

    c2 = int(jax.device_get(tile_counts(bbox, W, H).max()))
    sx, sy = jax.device_get(tile_span_max(bbox, W, H))
    binning = bin_triangles(bbox, W, H, max(-(-c2 // 8) * 8, 8),
                            span_x=pipeline._round_span(int(sx)),
                            span_y=pipeline._round_span(int(sy)))
    o0, o1, o2, om = tiles.render_gbuffer(records, binning.tile_lists, W, H)

    np.testing.assert_array_equal(np.asarray(ms), np.asarray(om))
    both = np.asarray(om)
    for a, b in ((v0s, o0), (v1s, o1), (v2s, o2)):
        np.testing.assert_array_equal(
            np.where(both, np.asarray(a), 0), np.where(both, np.asarray(b), 0))


@requires_tpu
def test_strips_extended_fs_matches_oracle(monkeypatch):
    """Dense-path selection combined with the EXTENDED fragment pipeline
    (Renderer.render_rgba's mode): force the strip walk on a small DEM and
    byte-compare against the jnp oracle route."""
    h = (np.outer(np.linspace(0, 1, 24), np.linspace(1, 0, 24)) * 30
         ).astype(np.float32)
    imgs = {}
    for be, thresh in (("pallas", 1), ("jnp", 10**9)):
        monkeypatch.setattr(pipeline, "SEGMENT_THRESHOLD", thresh)
        monkeypatch.setenv("VF_BACKEND", be)
        r = vf.Renderer(160, 120)
        r.add_terrain(h, (5.0, 5.0), 1.0, "magma")
        r.set_sun(40.0, 210.0)
        imgs[be] = r.render_rgba()
    np.testing.assert_array_equal(imgs["pallas"], imgs["jnp"])


@pytest.mark.parametrize("wh", [(130, 57), (64, 100), (257, 9)])
def test_raster_odd_shapes_vs_bruteforce(wh):
    """Odd framebuffer shapes (partial tiles on both axes) vs a
    brute-force per-pixel evaluator: crop/padding edge cases."""
    import jax
    import jax.numpy as jnp
    from vulkan_forge._raster import tiles
    from vulkan_forge._raster.setup import (bin_triangles, clip_to_fb,
                                            tile_counts, tile_span_max,
                                            triangle_setup)
    W, H = wh
    rng = np.random.default_rng(W * 1000 + H)
    n = 12
    v = rng.uniform(-1.1, 1.1, (n * 3, 2))
    clip = np.concatenate([v, np.full((n * 3, 1), 0.5),
                           np.ones((n * 3, 1))], 1).astype(np.float32)
    attrs = rng.uniform(-2, 2, (n * 3, 3)).astype(np.float32)
    indices = np.arange(n * 3, dtype=np.int32).reshape(-1, 3)

    with jax.default_device(jax.devices("cpu")[0]):
        x, y, z, w = clip_to_fb(jnp.asarray(clip), W, H)
        records, bbox = triangle_setup(x, y, z, w, jnp.asarray(attrs),
                                       jnp.asarray(indices), W, H)
        cmax = int(tile_counts(bbox, W, H).max())
        sx, sy = tile_span_max(bbox, W, H)
        binning = bin_triangles(bbox, W, H, max(cmax, 8),
                                span_x=pipeline._round_span(int(sx)),
                                span_y=pipeline._round_span(int(sy)))
        v0, v1, v2, mask = tiles.render_gbuffer(
            records, binning.tile_lists, W, H)

        # brute force: every pixel against every record, same f32 math
        rec = np.asarray(records)
        xs = (np.arange(W, dtype=np.float32) + 0.5)[None, :]
        ys = (np.arange(H, dtype=np.float32) + 0.5)[:, None]
        bid = np.full((H, W), -1, np.int32)
        bv0 = np.zeros((H, W), np.float32)
        for t in range(n):
            r = rec[t]
            f0 = np.float32(r[2]) * (xs - np.float32(r[0])) - np.float32(r[3]) * (ys - np.float32(r[1]))
            f1 = np.float32(r[6]) * (xs - np.float32(r[4])) - np.float32(r[7]) * (ys - np.float32(r[5]))
            f2 = np.float32(r[10]) * (xs - np.float32(r[8])) - np.float32(r[11]) * (ys - np.float32(r[9]))
            aw = f0 * r[21] + f1 * r[22] + f2 * r[23]
            az = f0 * r[25] + f1 * r[26] + f2 * r[27]
            asum = f0 * r[28] + f1 * r[29] + f2 * r[30]
            cov = ((f0 >= 0) & (f1 >= 0) & (f2 >= 0) & (r[24] > 0)
                   & (az >= 0) & (aw > 0) & (asum - az >= 0))
            a0 = f0 * r[12] + f1 * r[13] + f2 * r[14]
            val = np.where(np.abs(aw) < 1e-20, a0, a0 / np.where(
                np.abs(aw) < 1e-20, 1.0, aw))
            bid[cov] = t
            bv0[cov] = val[cov].astype(np.float32)

        np.testing.assert_array_equal(np.asarray(mask), bid >= 0)
        both = bid >= 0
        np.testing.assert_allclose(np.where(both, np.asarray(v0), 0),
                                   np.where(both, bv0, 0), rtol=1e-5,
                                   atol=1e-5)


@requires_tpu
def test_terrain_backends_identical_random_cameras(monkeypatch, seed):
    """Backend byte-identity under randomized cameras (fixed-camera tests
    can hide angle-dependent kernel bugs; the round-1 segment-perm defect
    was exactly such a case)."""
    rng = np.random.default_rng(seed)
    eye = rng.uniform([-4, 0.5, -4], [4, 3.5, 4])
    tgt = rng.uniform([-0.4, -0.3, -0.4], [0.4, 0.3, 0.4])
    h = rng.standard_normal((32, 32)).astype(np.float32) * 0.2
    imgs = {}
    for be in ("jnp", "pallas"):
        monkeypatch.setenv("VF_BACKEND", be)
        s = vf.Scene(160, 120, 32, "magma")
        s.set_height_from_r32f(h)
        s.set_camera_look_at(tuple(eye), tuple(tgt), (0, 1, 0),
                             50.0, 0.1, 100.0)
        imgs[be] = s.render_rgba()
    np.testing.assert_array_equal(imgs["jnp"], imgs["pallas"])

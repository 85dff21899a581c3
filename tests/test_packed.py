"""Packed-stream backend tests (round 3 dense-mesh default).

The Pallas kernel's byte-parity through the Scene API is covered in
test_raster_core; here the pure-jnp reference walker (the CPU-mesh
fallback and executable spec, packed.render_gbuffer_packed_ref) is pinned
byte-exact against the tile oracle, the stream/worklist tables are checked
structurally, and the hw fill-rule mode is pinned against the fixed-point
oracle (hw_oracle.py).
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_tpu


def _cpu():
    return jax.devices("cpu")[0]


def _spike(grid, W, H, eye=(3.0, 2.0, 3.0)):
    from vulkan_forge import _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    from vulkan_forge._raster import transform
    from vulkan_forge._raster.setup import clip_to_fb, setup_cols

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


def _oracle(x, y, z, w, vary, indices, W, H, fill_rule="inclusive"):
    from vulkan_forge._raster import tiles
    from vulkan_forge._raster.setup import (bin_triangles, tile_counts,
                                            tile_span_max, triangle_setup)
    records, bbox = triangle_setup(x, y, z, w, vary, indices, W, H,
                                   fill_rule=fill_rule)
    cap = int(tile_counts(bbox, W, H).max())
    sx, sy = tile_span_max(bbox, W, H)
    binning = bin_triangles(bbox, W, H, max(cap, 8),
                            span_x=int(sx), span_y=int(sy))
    return tiles.render_gbuffer(records, binning.tile_lists, W, H,
                                fill_rule=fill_rule)


@pytest.mark.parametrize("grid,W,H,eye", [
    (12, 96, 64, (3.0, 2.0, 3.0)),
    (16, 160, 120, (0.9, 0.25, 0.7)),   # near-clip-crossing camera
])
def test_packed_ref_matches_oracle(grid, W, H, eye):
    # On the default (TPU) device both graphs are byte-identical. (XLA:CPU
    # FMA-contracts a*b+c differently per fusion context, so on a CPU
    # device the interpolated VALUES can differ in the last ulp while
    # coverage/winners still match exactly -- the determinism contract is
    # per-backend byte-stability, pinned in test_determinism.)
    from vulkan_forge._raster import packed
    from vulkan_forge._raster.setup import setup_cols

    x, y, z, w, vary, indices = _spike(grid, W, H, eye)
    cols, bbox = setup_cols(x, y, z, w, vary, indices, W, H)
    ref = _oracle(x, y, z, w, vary, indices, W, H)
    got = packed.render_gbuffer_packed_ref(
        tuple(cols), bbox, 2 * (grid - 1), W, H)
    import jax as _jax
    on_cpu = _jax.default_backend() == "cpu"
    for a, b in zip(ref, got):
        a, b = np.asarray(a), np.asarray(b)
        if on_cpu and a.dtype != np.bool_:
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
        else:
            np.testing.assert_array_equal(a, b)


def test_packed_stream_tables():
    # Hand-built bboxes: stream metadata and worklists must reflect them.
    from vulkan_forge._raster import packed

    with jax.default_device(_cpu()):
        T, row_size = 64, 32          # 2 mesh rows, 1 super per row
        W, H = 256, 32                # 2 tile columns, 4 tile rows
        bbox = np.tile(np.array([10_000, -1, 10_000, -1], np.int32), (T, 1))
        bbox[0] = (0, 5, 0, 5)        # row 0, block 0: col 0, ty 0
        bbox[9] = (130, 140, 9, 25)   # row 0, block 1: col 1, ty 1..3
        bbox[40] = (100, 135, 26, 30) # row 1, block 1: cols 0-1, ty 3
        cols = tuple(jnp.zeros((T,), jnp.float32) for _ in range(31))
        stream, wl_start, wl_n, counts, _nf = packed.build_packed_stream(
            cols, jnp.asarray(bbox), row_size, W, H)
        stream = np.asarray(stream)
        # supers = 2; block (s=0, g=0) meta: ty0=0, ntrips=1, tx0=0, tx1=0
        m = stream[0:8, 0 * 32 + 31]
        assert m[0] == 0 and m[1] == 1 and m[2] == 0 and m[3] == 0
        # block (s=0, g=1) holds tris 8..15 -> tri 9: ty 1..3, col 1
        m = stream[0:8, 1 * 32 + 31]
        assert m[0] == 1 and m[1] == 3 and m[2] == 1 and m[3] == 1
        # block (s=1, g=1) holds tris 40..47 -> tri 40: ty 3, cols 0..1
        m = stream[8:16, 1 * 32 + 31]
        assert m[0] == 3 and m[1] == 1 and m[2] == 0 and m[3] == 1
        # all-invalid blocks: zero trips
        m = stream[0:8, 2 * 32 + 31]
        assert m[1] == 0
        # worklists: col 0 sees row 0 (super 0) and row 1 (super 1)
        wl_start, wl_n, counts = (np.asarray(wl_start), np.asarray(wl_n),
                                  np.asarray(counts))
        assert counts.tolist() == [2, 2]
        assert wl_start[0, :2].tolist() == [0, 1]
        assert wl_n[0, :2].tolist() == [1, 1]


def test_packed_gap_coalescing(monkeypatch):
    # VF_PACKED_GAP merges near-adjacent per-row intervals into one entry;
    # coverage work only grows (idempotent under the painter max), so the
    # tables must span every super the uncoalesced worklist spans.
    from vulkan_forge._raster import packed

    with jax.default_device(_cpu()):
        T, row_size = 128, 32         # 4 mesh rows, 1 super per row
        W, H = 256, 32
        bbox = np.tile(np.array([10_000, -1, 10_000, -1], np.int32), (T, 1))
        bbox[0] = (0, 5, 0, 5)        # row 0 -> super 0, col 0
        bbox[33] = (2, 9, 9, 25)      # row 1 -> super 1, col 0
        bbox[100] = (90, 120, 26, 30) # row 3 -> super 3, col 0 (gap of 1)
        cols = tuple(jnp.zeros((T,), jnp.float32) for _ in range(31))

        monkeypatch.setenv("VF_PACKED_GAP", "1")
        _, wl_start, wl_n, counts, _nf = packed.build_packed_stream(
            cols, jnp.asarray(bbox), row_size, W, H)
        assert np.asarray(counts)[0] == 1           # 0,1 + gap + 3 merged
        assert np.asarray(wl_start)[0, 0] == 0
        assert np.asarray(wl_n)[0, 0] == 4          # spans supers 0..3

        monkeypatch.setenv("VF_PACKED_GAP", "0")
        _, wl_start0, wl_n0, counts0, _nf0 = packed.build_packed_stream(
            cols, jnp.asarray(bbox), row_size, W, H)
        assert np.asarray(counts0)[0] == 3          # uncoalesced: 3 entries


def test_packed_gap_parity(monkeypatch):
    # End-to-end: the coalesced walk is byte-identical to the tile oracle
    # (merged entries only re-walk supers, never change winners).
    from vulkan_forge._raster import packed
    from vulkan_forge._raster.setup import setup_cols

    monkeypatch.setenv("VF_PACKED_GAP", "4")
    x, y, z, w, vary, indices = _spike(16, 160, 120, (0.9, 0.25, 0.7))
    cols, bbox = setup_cols(x, y, z, w, vary, indices, 160, 120)
    ref = _oracle(x, y, z, w, vary, indices, 160, 120)
    got = packed.render_gbuffer_packed_ref(
        tuple(cols), bbox, 2 * (16 - 1), 160, 120)
    on_cpu = jax.default_backend() == "cpu"
    for a, b in zip(ref, got):
        a, b = np.asarray(a), np.asarray(b)
        if on_cpu and a.dtype != np.bool_:
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
        else:
            np.testing.assert_array_equal(a, b)


def test_setup_cols_grid_matches_gathered():
    # The gather-free split-row grid setup must reproduce setup_cols'
    # columns and bboxes bit-for-bit under its stream permutation (both
    # fill rules), with all pad slots invalid.
    from vulkan_forge._raster.setup import (grid_split_ids, setup_cols,
                                            setup_cols_grid)

    grid, W, H = 16, 160, 120
    cells = grid - 1
    x, y, z, w, vary, indices = _spike(grid, W, H, (0.9, 0.25, 0.7))
    for rule in ("inclusive", "hw"):
        ca, ba = setup_cols(x, y, z, w, vary, indices, W, H, fill_rule=rule)
        cb, bb, meta = setup_cols_grid(x, y, z, w, vary, grid, W, H,
                                       fill_rule=rule)
        rs2, tri_ids = grid_split_ids(grid)
        assert int(meta["row_size"]) == int(rs2)
        ids = np.asarray(tri_ids)
        valid_slots = np.array([q * int(rs2) + p for q in range(2 * cells)
                                for p in range(cells)])
        perm = np.full(2 * cells * cells, -1, np.int64)
        perm[ids[valid_slots]] = valid_slots
        assert (perm >= 0).all()
        assert len(ca) == len(cb)
        for p, q in zip(ca, cb):
            np.testing.assert_array_equal(np.asarray(p),
                                          np.asarray(q)[perm])
        np.testing.assert_array_equal(np.asarray(ba), np.asarray(bb)[perm])
        pad = np.setdiff1d(np.arange(2 * cells * int(rs2)), valid_slots)
        assert (np.asarray(cb[24])[pad] == 0).all()


def test_packed_split_grid_matches_oracle():
    # The split-row packed path (meta-stamped true ids, stride 2) must
    # paint byte-identically to the tile oracle through the batch API.
    from vulkan_forge._raster import packed
    from vulkan_forge._raster.setup import grid_split_ids, setup_cols_grid

    grid, W, H = 16, 160, 120
    x, y, z, w, vary, indices = _spike(grid, W, H, (0.9, 0.25, 0.7))
    ref = _oracle(x, y, z, w, vary, indices, W, H)
    cols, bbox, _ = setup_cols_grid(x, y, z, w, vary, grid, W, H)
    rs2, tri_ids = grid_split_ids(grid)
    got = packed.render_gbuffer_packed_ref(
        tuple(cols), bbox, int(rs2), W, H, tri_ids=tri_ids, id_stride=2)
    import jax as _jax
    on_cpu = _jax.default_backend() == "cpu"
    for a, b in zip(ref, got):
        a, b = np.asarray(a), np.asarray(b)
        if on_cpu and a.dtype != np.bool_:
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
        else:
            np.testing.assert_array_equal(a, b)
    if not on_cpu:
        # the Pallas kernel on the same split stream (the pipeline gates
        # the split to T >= 400K; the batch API has no gate, so a small
        # scene exercises the id-meta kernel cheaply)
        cols_b = tuple(c[None] for c in cols)
        got_k = packed.render_gbuffer_packed_batch(
            cols_b, bbox[None], int(rs2), W, H, tri_ids=tri_ids,
            id_stride=2)
        for a, b in zip(ref, got_k):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[0])


@requires_tpu
def test_packed_exact_ids_identical():
    # The split (hi, lo) painter compare used for T >= 2^24 must paint
    # byte-identically to the single-f32-id kernel on any scene.
    from vulkan_forge._raster import packed
    from vulkan_forge._raster.setup import setup_cols

    grid, W, H = 16, 160, 120
    x, y, z, w, vary, indices = _spike(grid, W, H)
    cols, bbox = setup_cols(x, y, z, w, vary, indices, W, H)
    cols_b = tuple(c[None] for c in cols)
    rs = 2 * (grid - 1)
    a = packed.render_gbuffer_packed_batch(cols_b, bbox[None], rs, W, H)
    b = packed.render_gbuffer_packed_batch(cols_b, bbox[None], rs, W, H,
                                           force_exact_ids=True)
    for pa, pb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_hw_fill_rule_matches_fixed_point_oracle():
    # VF_FILL_RULE=hw coverage must equal the int64 top-left oracle exactly
    # (shared mesh edges covered by exactly one triangle).
    from vulkan_forge._raster import hw_oracle
    from vulkan_forge import _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu

    grid, W, H = 16, 160, 120
    with jax.default_device(_cpu()):
        xyuv, idx = _mesh.build_grid_xyuv(grid)
        x = xyuv[:, 0]
        z = xyuv[:, 1]
        h = np.sin(x * 1.3) * 0.25 + np.cos(z * 1.1) * 0.25
        view = look_at_rh((3.0, 2.0, 3.0), (0, 0, 0), (0, 1, 0))
        proj = perspective_wgpu(np.float32(math.radians(45.0)),
                                np.float32(W / H), np.float32(0.1),
                                np.float32(100.0))
        world = np.stack([x, h, z, np.ones_like(x)], axis=-1)
        clip = (world @ view.T) @ proj.T
        vary = np.stack([h, x, z], axis=-1)
        indices = idx.astype(np.int32).reshape(-1, 3)

        hw_id, _ = hw_oracle.rasterize_hw(clip, vary, indices, W, H)

        from vulkan_forge._raster.setup import clip_to_fb
        xf, yf, zf, wf = clip_to_fb(jnp.asarray(clip, jnp.float32), W, H)
        _, _, _, mask = _oracle(xf, yf, zf, wf,
                                jnp.asarray(vary, jnp.float32),
                                jnp.asarray(indices), W, H, fill_rule="hw")
        np.testing.assert_array_equal(np.asarray(mask), hw_id >= 0)


def test_hw_fill_rule_shared_edges_single_owner():
    # Two triangles sharing a diagonal: under the hw rule no pixel may be
    # double-covered along the shared edge, and the union must equal the
    # inclusive union (no dropped interior pixels).
    from vulkan_forge._raster import tiles
    from vulkan_forge._raster.setup import (bin_triangles, tile_counts,
                                            tile_span_max, triangle_setup)

    W, H = 64, 64
    with jax.default_device(_cpu()):
        # unit quad split along the diagonal, axis-aligned in clip space
        pos = np.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]],
                       np.float32)
        clip = np.concatenate([pos, np.zeros((4, 1), np.float32),
                               np.ones((4, 1), np.float32)], axis=1)
        vary = np.eye(4, 3, dtype=np.float32)
        indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)

        from vulkan_forge._raster.setup import clip_to_fb
        x, y, z, w = clip_to_fb(jnp.asarray(clip), W, H)

        masks = {}
        for rule in ("inclusive", "hw"):
            records, bbox = triangle_setup(
                x, y, z, w, jnp.asarray(vary), jnp.asarray(indices), W, H,
                fill_rule=rule)
            binning = bin_triangles(bbox, W, H, 8, span_x=1, span_y=8)
            v0, v1, v2, mask = tiles.render_gbuffer(
                records, binning.tile_lists, W, H, fill_rule=rule)
            masks[rule] = np.asarray(mask)
        # same union coverage; the rules differ only in shared-edge OWNERSHIP
        np.testing.assert_array_equal(masks["hw"], masks["inclusive"])


def test_packed_split_fs_byte_identical():
    # VF_PACKED_SPLIT_FS=1 runs the fragment epilogue as a second
    # executable (mis-fusion experiment knob); pixels must not change.
    import os
    import numpy as np
    import vulkan_forge as vf
    from vulkan_forge._raster import pipeline

    def render():
        t = vf.TerrainSpike(160, 120, 48)
        t.set_camera_look_at((3.0, 2.0, 3.0), (0, 0, 0), (0, 1, 0),
                             45.0, 0.1, 100.0)
        return t.render_rgba()

    old_thr = pipeline.SEGMENT_THRESHOLD
    pipeline.SEGMENT_THRESHOLD = 1      # route the 48-grid through packed
    try:
        fused = render()
        os.environ["VF_PACKED_SPLIT_FS"] = "1"
        try:
            split = render()
        finally:
            os.environ.pop("VF_PACKED_SPLIT_FS", None)
    finally:
        pipeline.SEGMENT_THRESHOLD = old_thr
    np.testing.assert_array_equal(fused, split)

"""Unit tests for the segment-walk binning tables (host-side numpy checks;
byte-parity of the kernel itself is covered in test_raster_core)."""
import numpy as np
import jax.numpy as jnp

from vulkan_forge._raster.segments import SEG_BLK, compact_valid, segment_bin


def _bbox(entries, T):
    """entries: dict id -> (px0, px1, py0, py1); others invalid."""
    b = np.tile(np.array([10_000, -1, 10_000, -1], np.int32), (T, 1))
    for t, v in entries.items():
        b[t] = v
    return jnp.asarray(b)


def test_segment_tables_basic():
    # 2 mesh rows of 4 tris; fb 256x16 -> 2x2 tiles (128x8).
    T, row_size = 8, 4
    bbox = _bbox({
        0: (0, 10, 0, 3),        # row 0, tile col 0, tile row 0
        2: (130, 140, 0, 3),     # row 0, tile col 1
        5: (5, 6, 9, 12),        # row 1, tile col 0, tile row 1
        6: (100, 135, 9, 12),    # row 1, cols 0-1
    }, T)
    sb = segment_bin(bbox, width=256, height=16, row_size=row_size)
    seg_lo, seg_hi = np.asarray(sb.seg_lo), np.asarray(sb.seg_hi)
    row_base = np.asarray(sb.row_base)
    rb = np.asarray(sb.r_bounds)

    # Compacted ranks: row0 valid = [0, 2] -> ranks 0,1; row1 = [5, 6] -> 0,1.
    assert row_base.tolist() == [0, 2]
    # col 0, row 0: only tri 0 (rank 0)
    assert seg_lo[0, 0] == 0 and seg_hi[0, 0] == 0
    # col 1, row 0: only tri 2 (rank 1)
    assert seg_lo[1, 0] == 1 and seg_hi[1, 0] == 1
    # col 0, row 1: tris 5,6 (ranks 0..1)
    assert seg_lo[0, 1] == 0 and seg_hi[0, 1] == 1
    # col 1, row 1: tri 6 (rank 1)
    assert seg_lo[1, 1] == 1 and seg_hi[1, 1] == 1
    # tile row 0 only needs mesh row 0; tile row 1 only mesh row 1
    assert rb[0, 0] == 0 and rb[1, 0] == 0
    assert rb[0, 1] == 1 and rb[1, 1] == 1


def test_compact_valid_order_preserving():
    T = 20
    entries = {3: (0, 5, 0, 5), 7: (10, 20, 0, 5), 15: (30, 40, 0, 5)}
    bbox = _bbox(entries, T)
    records = jnp.asarray(
        np.arange(T + 1, dtype=np.float32)[:, None] * np.ones((1, 32), np.float32))
    crec, src = compact_valid(records, bbox, cap=8)
    src = np.asarray(src)
    assert src[:3].tolist() == [3, 7, 15]      # ascending (painter order kept)
    assert np.all(src[3:] == T)                 # padded with sentinel index
    assert np.asarray(crec)[0, 0] == 3.0
    assert np.asarray(crec)[-1, 0] == 0.0       # appended zero sentinel row


def test_empty_scene_tables():
    bbox = _bbox({}, 8)
    sb = segment_bin(bbox, width=256, height=16, row_size=4)
    rb = np.asarray(sb.r_bounds)
    assert np.all(rb[0] > rb[1])               # r_lo > r_hi => zero-trip loops
    assert np.all(np.asarray(sb.counts_est) == 0)

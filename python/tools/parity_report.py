#!/usr/bin/env python3
"""Fill-rule parity report: shipped f32 inclusive-edge raster vs the
fixed-point top-left hardware oracle (vulkan_forge._raster.hw_oracle).

Quantifies, per config, how far the renderer is from hardware
rasterization rules: differing-coverage pixel counts (all boundary), and
final-image channel deltas after identical fragment shading -- the honest
substitute for golden PNGs the reference snapshot does not ship
(SURVEY.md section 6 "+-1 LSB parity" north star).

Writes ONE JSON artifact:
  {"configs": [{name, covered_px, cov_diff_px, cov_diff_frac,
                interior_mismatch_px, max_lsb_delta_interior,
                max_lsb_delta_all, pct_pixels_within_1lsb}, ...],
   "all_interior_exact": bool}
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np


def _boundary(img):
    h, w = img.shape
    p = np.pad(img, 1, mode="edge")
    m = np.zeros(img.shape, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            m |= p[1 + dy:h + 1 + dy, 1 + dx:w + 1 + dx] != img
    return m


def spike_config(grid, width, height, eye=(3.0, 2.0, 3.0)):
    import jax.numpy as jnp
    from vulkan_forge import _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    from vulkan_forge._raster import transform

    xyuv, idx = _mesh.build_grid_xyuv(grid)
    x = xyuv[:, 0]
    z = xyuv[:, 1]
    h = np.sin(x * 1.3) * 0.25 + np.cos(z * 1.1) * 0.25
    view = look_at_rh(eye, (0, 0, 0), (0, 1, 0))
    proj = perspective_wgpu(np.float32(math.radians(45.0)),
                            np.float32(width / height),
                            np.float32(0.1), np.float32(100.0))
    world = np.stack([x, h, z, np.ones_like(x)], axis=-1)
    clip = (world @ view.T) @ proj.T
    varyings = np.stack([h, x, z], axis=-1)
    indices = idx.astype(np.int32).reshape(-1, 3)
    return clip, varyings, indices


def run_config(name, clip, varyings, indices, width, height, report,
               rule="shipped"):
    import jax
    import jax.numpy as jnp
    from vulkan_forge._raster import hw_oracle, tiles
    from vulkan_forge._raster.setup import (bin_triangles, clip_to_fb,
                                            tile_counts, tile_span_max,
                                            triangle_setup)

    fill_rule = "hw" if rule == "hw" else "inclusive"
    hw_id, hw_attr = hw_oracle.rasterize_hw(clip, varyings, indices,
                                            width, height)
    with jax.default_device(jax.devices("cpu")[0]):
        x, y, z, w = clip_to_fb(jnp.asarray(clip, jnp.float32),
                                width, height)
        records, bbox = triangle_setup(
            x, y, z, w, jnp.asarray(varyings, jnp.float32),
            jnp.asarray(indices), width, height, fill_rule=fill_rule)
        cmax = int(tile_counts(bbox, width, height).max())
        sx, sy = tile_span_max(bbox, width, height)
        binning = bin_triangles(bbox, width, height, max(cmax, 8),
                                span_x=int(sx), span_y=int(sy))
        v0, v1, v2, mask = tiles.render_gbuffer(
            records, binning.tile_lists, width, height,
            fill_rule=fill_rule)
        v0, v1, v2, mask = (np.asarray(v0), np.asarray(v1), np.asarray(v2),
                            np.asarray(mask))

    hw_cov = hw_id >= 0
    cov_diff = mask != hw_cov
    onb = _boundary(hw_id) | _boundary(mask.astype(np.int32))
    interior = ~onb

    # shade both with the identical epilogue (quantifies final u8 delta)
    import jax.numpy as jnp
    from vulkan_forge import _colormap
    from vulkan_forge._raster import fragment
    lut = jnp.asarray(_colormap.build_lut("viridis")[0])
    sun = jnp.asarray(np.array([0.5, 1.0, 0.3], np.float32) / 1.1661904)
    with jax.default_device(jax.devices("cpu")[0]):
        ours_u32 = np.asarray(fragment.terrain_fs(
            jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
            jnp.asarray(mask), lut, jnp.float32(1.0), jnp.float32(1.0), sun))
        hw_u32 = np.asarray(fragment.terrain_fs(
            jnp.asarray(hw_attr[..., 0].astype(np.float32)),
            jnp.asarray(hw_attr[..., 1].astype(np.float32)),
            jnp.asarray(hw_attr[..., 2].astype(np.float32)),
            jnp.asarray(hw_cov), lut, jnp.float32(1.0), jnp.float32(1.0),
            sun))

    def channels(u):
        return np.stack([(u >> s) & 0xFF for s in (0, 8, 16, 24)], -1).astype(np.int32)

    co, ch = channels(ours_u32), channels(hw_u32)
    delta = np.abs(co - ch).max(axis=-1)
    within1 = (delta <= 1).mean()

    entry = {
        "name": name,
        "rule": rule,
        "covered_px": int(hw_cov.sum()),
        "cov_diff_px": int(cov_diff.sum()),
        "cov_diff_frac": round(float(cov_diff.sum() / max(hw_cov.sum(), 1)), 5),
        "interior_mismatch_px": int((cov_diff & interior).sum()),
        "max_lsb_delta_interior": int(delta[interior].max()) if interior.any() else 0,
        "max_lsb_delta_all": int(delta.max()),
        "pct_pixels_within_1lsb": round(float(within1) * 100, 2),
    }
    report["configs"].append(entry)
    print(json.dumps(entry))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--grids", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--rules", choices=["shipped", "hw", "both"],
                    default="both",
                    help="production fill rule(s) to compare against the "
                         "fixed-point oracle: shipped (f32 all-inclusive) "
                         "and/or hw (VF_FILL_RULE=hw: 8.8 snap + top-left)")
    ap.add_argument("--full", action="store_true",
                    help="add the north-star 800x600 configs (grid=128 and "
                         "grid=1024, orbit + clip-crossing cameras; the "
                         "grid=1024 oracle pass takes minutes)")
    ap.add_argument("--json", default="parity_report.json")
    args = ap.parse_args(argv)

    rules = ["shipped", "hw"] if args.rules == "both" else [args.rules]
    configs = [(g, args.width, args.height, (3.0, 2.0, 3.0), "")
               for g in args.grids]
    if args.full:
        # BASELINE.json parity config: 800x600; clip-crossing camera sits
        # low and close so near-plane clipping slices the mesh.
        configs += [
            (128, 800, 600, (3.0, 2.0, 3.0), "_orbit"),
            (128, 800, 600, (0.9, 0.25, 0.7), "_clipcross"),
            (1024, 800, 600, (0.9, 0.25, 0.7), "_clipcross"),
        ]

    report = {"configs": []}
    for (g, w, h, eye, tag) in configs:
        clip, varyings, indices = spike_config(g, w, h, eye=eye)
        for rule in rules:
            run_config(f"spike_g{g}_{w}x{h}{tag}",
                       clip, varyings, indices, w, h, report, rule=rule)

    report["all_interior_exact"] = all(
        c["interior_mismatch_px"] == 0 for c in report["configs"])
    hw_entries = [c for c in report["configs"] if c["rule"] == "hw"]
    report["hw_coverage_exact"] = bool(hw_entries) and all(
        c["cov_diff_px"] == 0 for c in hw_entries)
    with open(args.json, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.json}; all_interior_exact="
          f"{report['all_interior_exact']}; hw_coverage_exact="
          f"{report.get('hw_coverage_exact')}")
    return 0 if report["all_interior_exact"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

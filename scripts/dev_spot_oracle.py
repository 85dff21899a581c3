#!/usr/bin/env python3
"""Referee grid=1024 deposit-vs-strips disagreement with an exact
per-tile jnp oracle on a handful of tiles."""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import vulkan_forge  # noqa: F401
from vulkan_forge import _mesh
from vulkan_forge._camera import look_at_rh, perspective_wgpu
from vulkan_forge._raster import deposit as dep
from vulkan_forge._raster import pipeline as P
from vulkan_forge._raster import strips, tiles

W, H, GRID, ANG = 800, 600, 1024, 2.4


def main():
    xyuv, idx = _mesh.build_grid_xyuv(GRID)
    indices = jnp.asarray(idx.astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), np.float32)
    eye = (3 * math.cos(ANG), 2.0, 3 * math.sin(ANG))
    view = jnp.asarray(look_at_rh(eye, (0, 0, 0), (0, 1, 0)))
    proj = jnp.asarray(perspective_wgpu(np.float32(math.radians(45)),
                                        np.float32(W / H), np.float32(0.1),
                                        np.float32(100)))
    records, bbox = P._terrain_records(jnp.asarray(xyuv), indices, heights,
                                       view, proj, jnp.float32(1.0),
                                       jnp.float32(1.0), W, H)

    cmax, span = jax.device_get(P._deposit_stats(bbox, W, H))
    cap = P._round_capacity(int(cmax))
    slots = 4 if int(span) <= 4 else 8
    (d0, d1, d2, dm), ovf = dep.render_gbuffer_deposit(
        records, bbox, W, H, cap, slots)
    s0, s1, s2, sm = strips.render_gbuffer_strips(
        records, bbox, 2 * (GRID - 1), W, H)

    dm_, sm_ = np.asarray(jax.device_get(dm)), np.asarray(jax.device_get(sm))
    d0_, s0_ = np.asarray(jax.device_get(d0)), np.asarray(jax.device_get(s0))
    diff = dm_ != sm_
    print(f"mask diffs total={diff.sum()}  dep_cov={dm_.sum()} "
          f"strip_cov={sm_.sum()}", flush=True)
    ys, xs = np.nonzero(diff)
    # histogram of diff tiles
    if len(ys):
        tt = (ys // 8) * 7 + (xs // 128)
        vals, cnts = np.unique(tt, return_counts=True)
        order = np.argsort(-cnts)
        print("top diff tiles (ty,tx,count):",
              [((int(v) // 7), int(v) % 7, int(c))
               for v, c in zip(vals[order[:6]], cnts[order[:6]])], flush=True)
        probe = [(int(v) // 7, int(v) % 7) for v in vals[order[:3]]]
    else:
        probe = []
    probe += [(40, 3), (10, 2)]

    bbox_np = np.asarray(jax.device_get(bbox))
    rec_np = np.asarray(jax.device_get(records))
    for ty, tx in probe[:5]:
        x0, x1 = tx * 128, tx * 128 + 128
        y0, y1 = ty * 8, ty * 8 + 8
        cand = np.nonzero((bbox_np[:, 0] <= x1 - 1) & (bbox_np[:, 1] >= x0)
                          & (bbox_np[:, 2] <= y1 - 1) & (bbox_np[:, 3] >= y0))[0]
        # ascending ids (painter order)
        tl = jnp.asarray(np.concatenate(
            [cand, [len(bbox_np)]]).astype(np.int32))[None, :]
        px = (jnp.arange(128, dtype=jnp.float32) + 0.5)[None, :] + x0
        py = (jnp.arange(8, dtype=jnp.float32) + 0.5)[:, None] + y0
        o0, o1, o2, om = tiles._raster_tile(
            jnp.asarray(rec_np)[tl[0]],
            jnp.broadcast_to(px, (8, 128)), jnp.broadcast_to(py, (8, 128)))
        om_ = np.asarray(jax.device_get(om))
        o0_ = np.asarray(jax.device_get(o0))
        dmt = dm_[y0:y1, x0:x1]
        smt = sm_[y0:y1, x0:x1]
        d0t = d0_[y0:y1, x0:x1]
        s0t = s0_[y0:y1, x0:x1]
        print(f"tile ({ty},{tx}): cands={len(cand)} "
              f"oracle_cov={om_.sum()} dep_cov={dmt.sum()} "
              f"strip_cov={smt.sum()} | dep==orc:"
              f"{(dmt == om_).all() and (np.where(om_, d0t, 0) == np.where(om_, o0_, 0)).all()} "
              f"strip==orc:"
              f"{(smt == om_).all() and (np.where(om_, s0t, 0) == np.where(om_, o0_, 0)).all()}",
              flush=True)


if __name__ == "__main__":
    main()

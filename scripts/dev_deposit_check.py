#!/usr/bin/env python3
"""Dev check: deposit kernel byte-parity vs jnp oracle + frame timing."""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import vulkan_forge  # noqa: F401
from vulkan_forge import _colormap, _mesh
from vulkan_forge._camera import look_at_rh, perspective_wgpu
from vulkan_forge._raster import deposit as dep
from vulkan_forge._raster import pipeline as P
from vulkan_forge._raster import tiles, transform
from vulkan_forge._raster.setup import (bin_triangles, clip_to_fb,
                                        tile_counts, tile_span_max,
                                        triangle_setup)


def scene(grid, W, H, ang=0.7):
    xyuv_np, idx_np = _mesh.build_grid_xyuv(grid)
    xyuv = jnp.asarray(xyuv_np)
    indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), jnp.float32)
    eye = (3 * math.cos(ang), 2.0, 3 * math.sin(ang))
    view = jnp.asarray(look_at_rh(eye, (0, 0, 0), (0, 1, 0)))
    proj = jnp.asarray(perspective_wgpu(
        np.float32(math.radians(45)), np.float32(W / H),
        np.float32(0.1), np.float32(100)))
    records, bbox = P._terrain_records(
        xyuv, indices, heights, view, proj, jnp.float32(1.0),
        jnp.float32(1.0), W, H)
    return records, bbox


def parity(grid, W, H, ang):
    records, bbox = scene(grid, W, H, ang)
    cmax, span = jax.device_get(P._deposit_stats(bbox, W, H))
    cap = P._round_capacity(int(cmax))
    slots = 4 if int(span) <= 4 else 8
    print(f"grid={grid} {W}x{H} ang={ang}: visits_max={int(cmax)} "
          f"span={int(span)} cap={cap} slots={slots}", flush=True)

    if int(span) > 8:
        print("  skipped: span > 8 (not a deposit scene)", flush=True)
        return
    (v0, v1, v2, m), ovf = dep.render_gbuffer_deposit(
        records, bbox, W, H, cap, slots)
    assert not bool(jax.device_get(ovf)), "overflow"

    # reference: jnp oracle for small T, strips (oracle-byte-identical,
    # pinned by test_raster_core) for dense meshes where the list gather
    # explodes.
    if grid < 400:
        c2 = int(jax.device_get(tile_counts(bbox, W, H).max()))
        sx, sy = jax.device_get(tile_span_max(bbox, W, H))
        binning = bin_triangles(bbox, W, H, max(P._round_capacity(c2), 8),
                                span_x=P._round_span(int(sx)),
                                span_y=P._round_span(int(sy)))
        o0, o1, o2, om = tiles.render_gbuffer(records, binning.tile_lists, W, H)
    else:
        from vulkan_forge._raster import strips
        o0, o1, o2, om = strips.render_gbuffer_strips(
            records, bbox, 2 * (grid - 1), W, H)

    m_, om_ = np.asarray(jax.device_get(m)), np.asarray(jax.device_get(om))
    print("  mask diff:", int((m_ != om_).sum()), flush=True)
    for name, a, b in (("v0", v0, o0), ("v1", v1, o1), ("v2", v2, o2)):
        a_, b_ = np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))
        both = m_ & om_
        neq = (a_ != b_) & both
        print(f"  {name}: byte-diff px={int(neq.sum())}"
              + (f" max|d|={np.abs(a_-b_)[neq].max():.3e}" if neq.any() else ""),
              flush=True)


def timing(grid=1024, W=800, H=600, B=4, reps=3):
    xyuv_np, idx_np = _mesh.build_grid_xyuv(grid)
    xyuv = jnp.asarray(xyuv_np)
    indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), jnp.float32)
    lut = jnp.asarray(_colormap.build_lut("viridis")[0])
    sun = jnp.asarray(np.array([0.5, 1.0, 0.3], np.float32) / 1.1661904)

    def cams(phase):
        vs, ps = [], []
        for i in range(B):
            a = 2 * math.pi * i / B + phase
            vs.append(look_at_rh((3 * math.cos(a), 2.0, 3 * math.sin(a)),
                                 (0, 0, 0), (0, 1, 0)))
            ps.append(perspective_wgpu(np.float32(math.radians(45)),
                                       np.float32(W / H), np.float32(0.1),
                                       np.float32(100)))
        return jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ps))

    # ratchet from frame 0
    records, bbox = scene(grid, W, H, 0.0)
    cmax, span = jax.device_get(P._deposit_stats(bbox, W, H))
    cap = P._round_capacity(int(cmax) * 2)
    slots = 4 if int(span) <= 4 else 8
    print(f"timing: cap={cap} slots={slots}", flush=True)

    def run(phase):
        vs, ps = cams(phase)
        imgs, ovf = P._terrain_render_batch_deposit(
            xyuv, indices, heights, vs, ps, lut, jnp.float32(-0.5),
            jnp.float32(0.5), jnp.float32(1.0), sun, jnp.float32(1.0),
            jnp.float32(1.0), W, H, cap, slots)
        s = jax.device_get((imgs[:, ::53, ::67], ovf))
        return s[1]

    ovf = run(0.99)  # compile
    print("  compile ok, ovf:", bool(ovf), flush=True)
    t0 = time.perf_counter()
    for r in range(reps):
        ovf = run(0.31 * r)
    dt = (time.perf_counter() - t0) / reps
    mpix = W * H * B / dt / 1e6
    print(f"  batch B={B}: {dt*1e3:.1f} ms -> {dt/B*1e3:.1f} ms/frame "
          f"= {mpix:.1f} Mpix/s (ovf={bool(ovf)})", flush=True)




def parity_visits(grid, W, H, ang):
    import jax
    from vulkan_forge._raster import deposit as dep
    records, bbox = scene(grid, W, H, ang)
    counts = jax.device_get(jax.jit(
        lambda b: dep.visit_counts(b, W, H),)(bbox))
    # NOTE: visit_counts is slab-granular; block-granular needs its own cap.
    # Use a generous cap from the block-level tables themselves.
    import jax.numpy as jnp
    ent, cnt, ovf = jax.jit(lambda b: dep.build_visit_tables(
        b, W, H, cap=8, slots=1 << 20, slab_t=dep.BLOCK_T,
        group_t=dep.BLOCK_T))(bbox)
    cmax = int(jax.device_get(cnt).max())  # true counts (clamped at 8? no: counts_raw min'd...)
    # counts returned are min(raw, cap): recompute raw via big cap
    ent, cnt, ovf = jax.jit(lambda b: dep.build_visit_tables(
        b, W, H, cap=1 << 17, slots=1 << 20, slab_t=dep.BLOCK_T,
        group_t=dep.BLOCK_T))(bbox)
    cmax = int(jax.device_get(cnt).max())
    cap = P._round_capacity(cmax)
    print(f"visits-kernel grid={grid} ang={ang}: max_percol={cmax} cap={cap}",
          flush=True)
    (v0, v1, v2, m), ovf = dep.render_gbuffer_visits(records, bbox, W, H, cap)
    assert not bool(jax.device_get(ovf))
    from vulkan_forge._raster import strips
    o0, o1, o2, om = strips.render_gbuffer_strips(
        records, bbox, 2 * (grid - 1), W, H)
    m_, om_ = np.asarray(jax.device_get(m)), np.asarray(jax.device_get(om))
    print("  mask diff:", int((m_ != om_).sum()), flush=True)
    for name, a, b in (("v0", v0, o0), ("v1", v1, o1), ("v2", v2, o2)):
        a_, b_ = np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))
        neq = (a_ != b_) & m_ & om_
        print(f"  {name}: byte-diff px={int(neq.sum())}", flush=True)
    return cap


def timing_visits(grid=1024, W=800, H=600, B=4, reps=3, cap=None):
    from vulkan_forge._raster import deposit as dep
    xyuv_np, idx_np = _mesh.build_grid_xyuv(grid)
    xyuv = jnp.asarray(xyuv_np)
    indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), jnp.float32)
    lut = jnp.asarray(_colormap.build_lut("viridis")[0])
    sun = jnp.asarray(np.array([0.5, 1.0, 0.3], np.float32) / 1.1661904)

    @functools.partial(jax.jit, static_argnames=("cap",))
    def batch(views, projs, cap):
        def prep(view, proj):
            clip, var = transform.terrain_vs(
                xyuv, heights, view, proj, jnp.float32(1.0), jnp.float32(1.0))
            x, y, z, w = clip_to_fb(clip, W, H)
            return triangle_setup(x, y, z, w, var, indices, W, H)
        records_b, bbox_b = jax.vmap(prep)(views, projs)
        (v0, v1, v2, m), ovf = dep.render_gbuffer_visits_batch(
            records_b, bbox_b, W, H, cap)
        h_range = jnp.float32(1.0)
        from vulkan_forge._raster import fragment
        imgs = jax.vmap(lambda a, b, c, mm: fragment.terrain_fs(
            a, b, c, mm, lut, h_range, jnp.float32(1.0), sun))(v0, v1, v2, m)
        return imgs, ovf

    def cams(phase):
        vs, ps = [], []
        for i in range(B):
            a = 2 * math.pi * i / B + phase
            vs.append(look_at_rh((3 * math.cos(a), 2.0, 3 * math.sin(a)),
                                 (0, 0, 0), (0, 1, 0)))
            ps.append(perspective_wgpu(np.float32(math.radians(45)),
                                       np.float32(W / H), np.float32(0.1),
                                       np.float32(100)))
        return jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ps))

    def run(phase):
        vs, ps = cams(phase)
        imgs, ovf = batch(vs, ps, cap)
        s = jax.device_get((imgs[:, ::53, ::67], ovf))
        return s[1]

    ovf = run(0.99)
    print("  visits batch compile ok, ovf:", bool(ovf), flush=True)
    t0 = time.perf_counter()
    for r in range(reps):
        ovf = run(0.31 * r)
    dt = (time.perf_counter() - t0) / reps
    mpix = W * H * B / dt / 1e6
    print(f"  visits batch B={B}: {dt*1e3:.1f} ms -> {dt/B*1e3:.1f} ms/frame "
          f"= {mpix:.1f} Mpix/s (ovf={bool(ovf)})", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    import os
    if os.environ.get("VF_DEV_VISITS", "0") == "1":
        cap = parity_visits(1024, 800, 600, 2.4)
        timing_visits(cap=max(cap * 2, 65536))
        raise SystemExit(0)
    reps = int(os.environ.get("VF_DEV_REPS", "1"))
    if os.environ.get("VF_DEV_512", "1") == "1":
        parity(512, 800, 600, 0.7)    # mid-density
    for _ in range(reps):
        parity(1024, 800, 600, 2.4)   # north-star config, worst camera
        parity(1024, 800, 600, 0.0)
    timing()

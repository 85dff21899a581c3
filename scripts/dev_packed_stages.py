#!/usr/bin/env python3
"""Stage-level timing of the packed dense path at grid=1024 b4 (v5e).

Stages: cols (VS+setup), prep column-matrix M, prep full stream+tables,
kernel-only on prebuilt operands, gbuffer (prep+kernel, no fragment),
full path (prep+kernel+fragment fused -- the docs/NEXT.md mis-fusion
suspect), and split epilogue (gbuffer jit, fragment in a second jit).
All timings device_get-forced (CLAUDE.md benchmark traps)."""
from __future__ import annotations

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vulkan_forge import _colormap, _mesh
from vulkan_forge._camera import look_at_rh, perspective_wgpu
from vulkan_forge._raster import packed as pk
from vulkan_forge._raster import pipeline as P, transform, fragment
from vulkan_forge._raster.setup import clip_to_fb, setup_cols

W, H = 800, 600
GRID = int(os.environ.get("VF_GRID", "1024"))
B = int(os.environ.get("VF_B", "4"))
REPS = 3
RS = 2 * (GRID - 1)

xyuv_np, idx_np = _mesh.build_grid_xyuv(GRID)
xyuv = jnp.asarray(xyuv_np)
indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
heights = jnp.zeros((1, 1), jnp.float32)
LUT = jnp.asarray(_colormap.build_lut("viridis")[0])
SUN = jnp.asarray(np.array([0.5, 1.0, 0.3], np.float32)
                  / np.linalg.norm([0.5, 1.0, 0.3]))


def cams(n, phase):
    vs, ps = [], []
    for i in range(n):
        a = 2 * math.pi * i / n + phase
        vs.append(look_at_rh((3 * math.cos(a), 2.0, 3 * math.sin(a)),
                             (0, 0, 0), (0, 1, 0)))
        ps.append(perspective_wgpu(np.float32(math.radians(45.0)),
                                   np.float32(W / H), np.float32(0.1),
                                   np.float32(100.0)))
    return jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(ps))


CAMS = [cams(B, 0.31 * r) for r in range(REPS + 1)]


def timeit(name, fn, force):
    fn(*CAMS[-1])
    t0 = time.perf_counter()
    for r in range(REPS):
        force(fn(*CAMS[r]))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:32s} {dt*1e3:9.2f} ms/batch ({dt*1e3/B:8.2f} ms/frame)")
    return dt


def prep_cols(view, proj):
    clip, vary = transform.terrain_vs(xyuv, heights, view, proj,
                                      jnp.float32(1.0), jnp.float32(1.0))
    x, y, z, w = clip_to_fb(clip, W, H)
    return setup_cols(x, y, z, w, vary, indices, W, H)


@jax.jit
def stage_cols(views, projs):
    cols_b, bbox_b = jax.vmap(prep_cols)(views, projs)
    return [c[:, ::65536] for c in cols_b], bbox_b[:, ::65536]


@jax.jit
def stage_m(views, projs):
    """Column matrix M only (no transpose, no tables)."""
    def one(view, proj):
        cols, bbox = prep_cols(view, proj)
        T = bbox.shape[0]
        rows = -(-T // RS)
        spr = -(-RS // pk.SUPER_T)
        tpad = rows * spr * pk.SUPER_T
        def rowpad(a):
            a = jnp.concatenate([a, jnp.zeros((rows * RS - T,), a.dtype)])
            return jnp.pad(a.reshape(rows, RS),
                           ((0, 0), (0, spr * pk.SUPER_T - RS))).reshape(tpad)
        return jnp.stack([rowpad(c) for c in cols], axis=0)
    M = jax.vmap(one)(views, projs)
    return M[:, :, ::65536]


@jax.jit
def stage_prep(views, projs):
    cols_b, bbox_b = jax.vmap(prep_cols)(views, projs)
    prep = jax.vmap(functools.partial(
        pk.build_packed_stream, row_size=RS, width=W, height=H))
    stream_b, wls, wln, counts = prep(tuple(cols_b), bbox_b)
    return stream_b[:, ::4096], wls[:, :, ::256], counts


@jax.jit
def make_operands(views, projs):
    cols_b, bbox_b = jax.vmap(prep_cols)(views, projs)
    prep = jax.vmap(functools.partial(
        pk.build_packed_stream, row_size=RS, width=W, height=H))
    return prep(tuple(cols_b), bbox_b)


@functools.partial(jax.jit, static_argnames=())
def kernel_only(stream_b, wls, wln, counts):
    ntx = -(-W // 128)
    T = indices.shape[0]
    rows = -(-T // RS)
    spr = -(-RS // pk.SUPER_T)
    supers_pad = max(-(-rows * spr // pk._SLAB) * pk._SLAB, pk._SLAB)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    h8 = -(-H // 8) * 8
    kernel = functools.partial(
        pk._packed_kernel, ntx=ntx, spr=spr, row_size=RS,
        frame_supers=supers_pad, exact_ids=False)
    out_shape = jax.ShapeDtypeStruct((B * h8, ntx * 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * ntx,),
        in_specs=[
            pl.BlockSpec((1, 1, rows, 1),
                         lambda p, *pref: (jax.lax.div(p, ntx),
                                           jax.lax.rem(p, ntx), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, 1),
                         lambda p, *pref: (jax.lax.div(p, ntx),
                                           jax.lax.rem(p, ntx), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=tuple(
            pl.BlockSpec((h8, 128),
                         lambda p, *pref: (jax.lax.div(p, ntx),
                                           jax.lax.rem(p, ntx)),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((h8, 128), jnp.float32) for _ in range(6)
        ] + [
            pltpu.VMEM((pk._RING, pk._SLAB * 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((pk._RING,)),
        ],
    )
    v0, v1, v2, m = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(out_shape,) * 4,
    )(counts.reshape(-1), wls[..., None], wln[..., None],
      stream_b.reshape(B * supers_pad * 8, 128))
    return v0[:, ::67], m[:, ::67]


@jax.jit
def gbuffer_only(views, projs):
    cols_b, bbox_b = jax.vmap(prep_cols)(views, projs)
    v0, v1, v2, m = pk.render_gbuffer_packed_batch(
        tuple(cols_b), bbox_b, RS, W, H)
    return v0[:, ::53, ::67], m[:, ::53, ::67]


@jax.jit
def split_fragment(v0, v1, v2, m):
    return jax.vmap(
        lambda a, b, c, mm: fragment.terrain_fs(
            a, b, c, mm, LUT, jnp.float32(1.0), jnp.float32(1.0), SUN)
    )(v0, v1, v2, m)


@jax.jit
def gbuffer_full(views, projs):
    cols_b, bbox_b = jax.vmap(prep_cols)(views, projs)
    return pk.render_gbuffer_packed_batch(tuple(cols_b), bbox_b, RS, W, H)


def main():
    g = jax.device_get
    timeit("cols (VS+setup)", stage_cols, lambda o: g(o))
    timeit("prep M (column matrix)", stage_m, lambda o: g(o))
    timeit("prep full (stream+tables)", stage_prep, lambda o: g(o))

    ops = [make_operands(*CAMS[r]) for r in range(REPS + 1)]
    def run_kernel(i):
        return kernel_only(*ops[i])
    run_kernel(REPS)
    t0 = time.perf_counter()
    for r in range(REPS):
        g(run_kernel(r))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{'kernel only':32s} {dt*1e3:9.2f} ms/batch ({dt*1e3/B:8.2f} ms/frame)")

    timeit("gbuffer (prep+kernel)", gbuffer_only, lambda o: g(o))

    # split epilogue: gbuffer jit then fragment jit
    gb = [gbuffer_full(*CAMS[r]) for r in range(REPS + 1)]
    def run_split(i):
        return split_fragment(*gb[i])[:, ::53, ::67]
    run_split(REPS)
    t0 = time.perf_counter()
    for r in range(REPS):
        g(run_split(r))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{'fragment only (split jit)':32s} {dt*1e3:9.2f} ms/batch")

    def full(views, projs):
        out = P._terrain_render_batch_packed(
            xyuv, indices, heights, views, projs, LUT,
            jnp.float32(-0.5), jnp.float32(0.5), jnp.float32(1.0), SUN,
            jnp.float32(1.0), jnp.float32(1.0), W, H, RS,
            fs_mode="shipped")
        return out[:, ::53, ::67]
    timeit("full (fused fragment)", full, lambda o: g(o))


if __name__ == "__main__":
    main()

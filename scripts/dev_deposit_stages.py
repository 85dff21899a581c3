#!/usr/bin/env python3
"""Per-stage timing of the deposit path at grid=1024, 800x600, B=1.

Stages (each its own jit; inputs varied per rep to defeat memoization):
  records : terrain_vs + triangle_setup
  rect    : build_rec_t (stream transpose)
  tables  : build_visit_tables (activity + nonzero)
  kernel  : the pallas call only (precomputed operands)
  frag    : fragment epilogue only
"""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import vulkan_forge  # noqa: F401
from vulkan_forge import _colormap, _mesh
from vulkan_forge._camera import look_at_rh, perspective_wgpu
from vulkan_forge._raster import deposit as dep
from vulkan_forge._raster import fragment
from vulkan_forge._raster import pipeline as P

W, H, GRID = 800, 600, 1024
REPS = 4


def cams(n=REPS + 1):
    vs = []
    for i in range(n):
        a = 0.31 * i + 0.45
        vs.append(look_at_rh((3 * math.cos(a), 2.0, 3 * math.sin(a)),
                             (0, 0, 0), (0, 1, 0)))
    proj = perspective_wgpu(np.float32(math.radians(45)), np.float32(W / H),
                            np.float32(0.1), np.float32(100))
    return [jnp.asarray(v) for v in vs], jnp.asarray(proj)


def timed(name, fn, inputs, force):
    out = fn(inputs[-1])
    jax.device_get(force(out))
    t0 = time.perf_counter()
    for i in range(REPS):
        out = fn(inputs[i])
        jax.device_get(force(out))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    xyuv_np, idx_np = _mesh.build_grid_xyuv(GRID)
    xyuv = jnp.asarray(xyuv_np)
    indices = jnp.asarray(idx_np.astype(np.int32).reshape(-1, 3))
    heights = jnp.zeros((1, 1), jnp.float32)
    views, proj = cams()
    lut = jnp.asarray(_colormap.build_lut("viridis")[0])
    sun = jnp.asarray(np.array([0.5, 1.0, 0.3], np.float32) / 1.1661904)

    rec_fn = lambda v: P._terrain_records(
        xyuv, indices, heights, v, proj, jnp.float32(1.0), jnp.float32(1.0),
        W, H)
    rb = timed("records ", rec_fn, views, lambda o: o[1][::4096])

    recs = [rec_fn(v) for v in views]
    cmax, span = jax.device_get(P._deposit_stats(recs[0][1], W, H))
    cap = P._round_capacity(int(cmax) * 2)
    slots = 4 if int(span) <= 4 else 8
    print(f"cap={cap} slots={slots} span={int(span)}", flush=True)

    rect_fn = jax.jit(dep.build_rec_t)
    timed("rect    ", lambda r: rect_fn(*r), recs, lambda o: o[:2, ::4096])

    tab_fn = jax.jit(functools.partial(
        dep.build_visit_tables, width=W, height=H, cap=cap, slots=slots))
    timed("tables  ", lambda r: tab_fn(r[1]), recs,
          lambda o: (o[0][:, ::512], o[1]))

    # kernel only
    rect_in = [rect_fn(*r) for r in recs]
    tabs_in = [tab_fn(r[1]) for r in recs]

    # call the pallas path via the module-internal pieces
    nslab = -(-int(indices.shape[0]) // dep.SLAB_T)
    ntx = -(-W // 128)
    nty = -(-H // 8)
    h8 = nty * 8
    kernel = functools.partial(
        dep._deposit_kernel, ntx=ntx, nty=nty, frame_slabs=nslab,
        slots=slots)
    out_shape = jax.ShapeDtypeStruct((h8, ntx * 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntx,),
        in_specs=[
            pl.BlockSpec((1, 1, cap, 1), lambda p, *pref: (0, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=tuple(
            pl.BlockSpec((h8, 128), lambda p, *pref: (0, p),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((h8, 128), jnp.float32) for _ in range(5)
        ] + [
            pltpu.VMEM((3, dep.REC_WIDTH, dep.SLAB_T), jnp.float32),
            pltpu.VMEM((48, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    call = jax.jit(pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(out_shape, out_shape, out_shape, out_shape)))

    kin = [(tabs_in[i][1].reshape(-1), tabs_in[i][0][None, ..., None],
            rect_in[i]) for i in range(len(recs))]
    gout = timed("kernel  ", lambda k: call(*k), kin,
                 lambda o: tuple(x[::97, ::101] for x in o))

    frag_fn = jax.jit(lambda v0, v1, v2, m: fragment.terrain_fs(
        v0[:H, :W], v1[:H, :W], v2[:H, :W], m[:H, :W] > 0.5, lut,
        jnp.float32(1.0), jnp.float32(1.0), sun))
    gouts = [call(*k) for k in kin]
    timed("frag    ", lambda g: frag_fn(*g), gouts,
          lambda o: o[::97, ::101])


if __name__ == "__main__":
    main()

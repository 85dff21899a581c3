"""Fused Pallas TPU raster kernel.

One grid step rasterizes one (TILE_H, TILE_W) framebuffer tile: it streams
that tile's binned triangle records from HBM into VMEM and runs the same
ascending-id overwrite loop as the jnp oracle (tiles.py) on VPU-native
(8, 128) pixel vectors. Outputs the raster G-buffer (3 perspective-correct
varyings + coverage); fragment shading stays in XLA where it fuses with the
sRGB/pack epilogue.

Determinism: the loop is a fixed-trip fori_loop with select-overwrites --
no atomics, no data-dependent control flow -- so device output is
byte-stable run to run (the property the reference pins with SHA-256 tests,
tests/test_determinism.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .setup import REC_WIDTH, TILE_H, TILE_W


def _kernel(recs_ref, v0_ref, v1_ref, v2_ref, mask_ref, *, tile_h, tile_w):
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    px = col + (tx * tile_w).astype(jnp.float32) + 0.5
    py = row + (ty * tile_h).astype(jnp.float32) + 0.5

    C = recs_ref.shape[2]
    zero = jnp.zeros((tile_h, tile_w), jnp.float32)

    def body(c, state):
        acc0, acc1, acc2, accw, covered = state
        r = recs_ref[0, 0, c, :]  # (REC_WIDTH,) one triangle record
        f0 = r[2] * (px - r[0]) - r[3] * (py - r[1])
        f1 = r[6] * (px - r[4]) - r[7] * (py - r[5])
        f2 = r[10] * (px - r[8]) - r[11] * (py - r[9])
        cov = (f0 >= 0.0) & (f1 >= 0.0) & (f2 >= 0.0) & (r[24] > 0.0)
        a0 = f0 * r[12] + f1 * r[13] + f2 * r[14]
        a1 = f0 * r[15] + f1 * r[16] + f2 * r[17]
        a2 = f0 * r[18] + f1 * r[19] + f2 * r[20]
        aw = f0 * r[21] + f1 * r[22] + f2 * r[23]
        return (jnp.where(cov, a0, acc0), jnp.where(cov, a1, acc1),
                jnp.where(cov, a2, acc2), jnp.where(cov, aw, accw),
                jnp.where(cov, 1.0, covered))

    init = (zero, zero, zero, jnp.ones((tile_h, tile_w), jnp.float32), zero)
    acc0, acc1, acc2, accw, covered = jax.lax.fori_loop(0, C, body, init)

    rcp = 1.0 / jnp.where(jnp.abs(accw) < 1e-20, 1.0, accw)
    v0_ref[...] = acc0 * rcp
    v1_ref[...] = acc1 * rcp
    v2_ref[...] = acc2 * rcp
    mask_ref[...] = covered


def render_gbuffer(records: jnp.ndarray, tile_lists: jnp.ndarray,
                   width: int, height: int,
                   tile_h: int = TILE_H, tile_w: int = TILE_W):
    """Pallas G-buffer raster. Same contract as tiles.render_gbuffer."""
    nty = -(-height // tile_h)
    ntx = -(-width // tile_w)
    capacity = tile_lists.shape[1]

    # Gather per-tile record blocks in XLA (one HBM-resident (NT, C, 32)
    # buffer the kernel streams tile by tile).
    tile_recs = records[tile_lists].reshape(nty, ntx, capacity, REC_WIDTH)

    out_shape = jax.ShapeDtypeStruct((nty * tile_h, ntx * tile_w), jnp.float32)
    kernel = functools.partial(_kernel, tile_h=tile_h, tile_w=tile_w)

    flops_per_px_tri = 44
    cost = pl.CostEstimate(
        flops=flops_per_px_tri * nty * ntx * tile_h * tile_w * capacity,
        bytes_accessed=tile_recs.size * 4 + 4 * nty * ntx * tile_h * tile_w * 4,
        transcendentals=0,
    )

    v0, v1, v2, mask = pl.pallas_call(
        kernel,
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec((1, 1, capacity, REC_WIDTH),
                               lambda ty, tx: (ty, tx, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        out_shape=(out_shape, out_shape, out_shape, out_shape),
        cost_estimate=cost,
    )(tile_recs)

    return (v0[:height, :width], v1[:height, :width], v2[:height, :width],
            mask[:height, :width] > 0.5)

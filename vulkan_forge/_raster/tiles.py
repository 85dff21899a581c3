"""Pixel-vectorized per-tile raster loop in pure jnp.

This is both the CPU/oracle backend and the executable specification for the
Pallas kernel in ``pallas_backend.py`` -- both iterate a tile's binned
triangle records in ascending-id order and overwrite covered pixels
(painter's order == last/maximum triangle id wins; the reference pipelines
have no depth buffer, src/terrain/pipeline.rs:133).

Output is the "G-buffer" of the raster stage: three perspective-correct
varyings plus a coverage mask per pixel. Fragment shading happens in
XLA-fused epilogues (see fragment.py).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from .setup import REC_WIDTH, TILE_H, TILE_W


def _raster_tile(tile_recs: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                 fill_rule: str = "inclusive"):
    """Rasterize one tile.

    tile_recs: (C, REC_WIDTH) records (sentinel rows have valid=0).
    px, py: (TH, TW) pixel-center coordinates.
    fill_rule "hw": edges compare against the per-edge top-left biases at
    record columns 31..33 (setup.py BIAS*_COL) instead of 0.
    Returns (var0, var1, var2, mask) each (TH, TW) f32 / bool.
    """
    C = tile_recs.shape[0]
    zero = jnp.zeros_like(px)

    def body(c, state):
        acc0, acc1, acc2, accw, covered = state
        r = tile_recs[c]
        f0 = r[2] * (px - r[0]) - r[3] * (py - r[1])
        f1 = r[6] * (px - r[4]) - r[7] * (py - r[5])
        f2 = r[10] * (px - r[8]) - r[11] * (py - r[9])
        a0 = f0 * r[12] + f1 * r[13] + f2 * r[14]
        a1 = f0 * r[15] + f1 * r[16] + f2 * r[17]
        a2 = f0 * r[18] + f1 * r[19] + f2 * r[20]
        aw = f0 * r[21] + f1 * r[22] + f2 * r[23]
        # Clip-volume tests (near z>=0, camera-front w>0, far z<=w) as
        # screen-linear functionals -- see setup.py "Near-plane clipping".
        az = f0 * r[25] + f1 * r[26] + f2 * r[27]
        asum = f0 * r[28] + f1 * r[29] + f2 * r[30]
        if fill_rule == "hw":
            edges = (f0 >= r[31]) & (f1 >= r[32]) & (f2 >= r[33])
        else:
            edges = (f0 >= 0.0) & (f1 >= 0.0) & (f2 >= 0.0)
        cov = (edges & (r[24] > 0.0)
               & (az >= 0.0) & (aw > 0.0) & (asum - az >= 0.0))
        return (jnp.where(cov, a0, acc0), jnp.where(cov, a1, acc1),
                jnp.where(cov, a2, acc2), jnp.where(cov, aw, accw),
                covered | cov)

    init = (zero, zero, zero, jnp.ones_like(px), jnp.zeros(px.shape, bool))
    acc0, acc1, acc2, accw, covered = jax.lax.fori_loop(0, C, body, init)

    rcp = 1.0 / jnp.where(jnp.abs(accw) < 1e-20, 1.0, accw)
    return acc0 * rcp, acc1 * rcp, acc2 * rcp, covered


def render_gbuffer(records: jnp.ndarray, tile_lists: jnp.ndarray,
                   width: int, height: int,
                   tile_h: int = TILE_H, tile_w: int = TILE_W,
                   fill_rule: str = "inclusive"):
    """Run the tile raster over the whole framebuffer (jnp backend).

    records: (T+1, REC_WIDTH); tile_lists: (NTY*NTX, C).
    Returns (var0, var1, var2, mask) each (H, W) where H/W are the true
    framebuffer dims (padding tiles cropped).
    """
    nty = -(-height // tile_h)
    ntx = -(-width // tile_w)

    tile_recs = records[tile_lists]  # (NT, C, REC_WIDTH)

    ty = (jnp.arange(nty * ntx, dtype=jnp.int32) // ntx)
    tx = (jnp.arange(nty * ntx, dtype=jnp.int32) % ntx)

    base_px = (jnp.arange(tile_w, dtype=jnp.float32) + 0.5)[None, :]
    base_py = (jnp.arange(tile_h, dtype=jnp.float32) + 0.5)[:, None]

    def one(recs, tyi, txi):
        px = base_px + txi.astype(jnp.float32) * tile_w
        py = base_py + tyi.astype(jnp.float32) * tile_h
        px = jnp.broadcast_to(px, (tile_h, tile_w))
        py = jnp.broadcast_to(py, (tile_h, tile_w))
        return _raster_tile(recs, px, py, fill_rule=fill_rule)

    v0, v1, v2, m = jax.vmap(one)(tile_recs, ty, tx)   # (NT, TH, TW)

    def assemble(t):
        t = t.reshape(nty, ntx, tile_h, tile_w)
        t = jnp.transpose(t, (0, 2, 1, 3)).reshape(nty * tile_h, ntx * tile_w)
        return t[:height, :width]

    return assemble(v0), assemble(v1), assemble(v2), assemble(m)

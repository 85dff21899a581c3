#!/usr/bin/env python3
"""Deposit-step REAL costs: NSTEP=65536 so the ~4.7ms fixed dispatch
overhead amortizes to ~72ns noise. Strips-style structure (scalar carry,
ref RMW), loop-variant operands.

  d_base   : dyn rec slice + dyn RMW                      (floor)
  d_strips : strips-kernel visit: 8 tris x (8,8,128) eval+resolve+6 merges
  d_eval4  : deposit eval, 128 tris x 4 slots x 8 dy
  d_mm     : base + 3 fused matmuls (48+32 LHS, 4x128 K-blocks) + GB
  d_full   : complete deposit trip
"""
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

NSTEP = 65536


def hi_dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def run(body, name, n=3):
    def kernel(big_ref, o_ref, acc_ref):
        def step(i, carry):
            return body(big_ref, i, acc_ref, carry)
        out = jax.lax.fori_loop(0, NSTEP, step, jnp.float32(0.0))
        o_ref[...] = acc_ref[0:8, :] + out

    rng = np.random.default_rng(2)
    big = rng.standard_normal((1024, 128)).astype(np.float32) * 0.1
    big[25] = rng.integers(0, 124, 128).astype(np.float32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((768, 128), jnp.float32)],
    )
    jf = jax.jit(f)
    x = jnp.asarray(big)
    jax.device_get(jf(x))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(x)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / n / NSTEP
    print(f"{name}: {dt*1e9:.0f} ns/step", flush=True)
    return dt


def recs_of(big, i):
    return big[pl.ds(jax.lax.rem(i, 8) * 32, 32), :]


def py_of(i):
    dy = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(jnp.float32)
    ty = jax.lax.rem(i, 64)
    return dy + (ty * 8).astype(jnp.float32) + 0.5, ty


def eval_slot(recs, py, s):
    def col(k):
        return recs[k, :].reshape(1, 128)
    px = col(25) + (jnp.float32(s) + 0.5)
    f0 = col(2) * (px - col(0)) - col(3) * (py - col(1))
    f1 = col(6) * (px - col(4)) - col(7) * (py - col(5))
    f2 = col(10) * (px - col(8)) - col(11) * (py - col(9))
    aw = f0 * col(21) + f1 * col(22) + f2 * col(23)
    az = f0 * col(25) + f1 * col(26) + f2 * col(27)
    asum = f0 * col(28) + f1 * col(29) + f2 * col(30)
    cov = ((f0 >= 0.) & (f1 >= 0.) & (f2 >= 0.) & (az >= 0.)
           & (aw > 0.) & (asum - az >= 0.)).astype(jnp.float32)
    a0 = f0 * col(12) + f1 * col(13) + f2 * col(14)
    a1 = f0 * col(15) + f1 * col(16) + f2 * col(17)
    a2 = f0 * col(18) + f1 * col(19) + f2 * col(20)
    return cov, a0, a1, a2, aw


def d_base(big, i, acc, carry):
    recs = recs_of(big, i)
    py, ty = py_of(i)
    sl = pl.ds(ty * 8, 8)
    acc[sl, :] = acc[sl, :] + recs[0:8, :] + py
    return carry


def d_strips(big, i, acc, carry):
    # one strips visit: 8 tris (sublanes) x (8,8,128) against a tile row
    rec = recs_of(big, i)[0:8, :]              # (8,128) 8 tri records
    py, ty = py_of(i)

    def col(k):
        return rec[:, k].reshape(1, 8, 1)
    px = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2).astype(jnp.float32) + 0.5
    py3 = py.reshape(8, 1, 1)
    f0 = col(2) * (px - col(0)) - col(3) * (py3 - col(1))
    f1 = col(6) * (px - col(4)) - col(7) * (py3 - col(5))
    f2 = col(10) * (px - col(8)) - col(11) * (py3 - col(9))
    a0 = f0 * col(12) + f1 * col(13) + f2 * col(14)
    a1 = f0 * col(15) + f1 * col(16) + f2 * col(17)
    a2 = f0 * col(18) + f1 * col(19) + f2 * col(20)
    aw = f0 * col(21) + f1 * col(22) + f2 * col(23)
    az = f0 * col(25) + f1 * col(26) + f2 * col(27)
    asum = f0 * col(28) + f1 * col(29) + f2 * col(30)
    cov = ((f0 >= 0.) & (f1 >= 0.) & (f2 >= 0.) & (az >= 0.)
           & (aw > 0.) & (asum - az >= 0.))
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1).astype(jnp.float32)
    cids = jnp.where(cov, ids, -1.0)
    wid = jnp.max(cids, axis=1, keepdims=True)
    sel = ((cids == wid) & cov).astype(jnp.float32)
    cid = wid[:, 0, :]
    c0 = jnp.sum(a0 * sel, axis=1)
    c1 = jnp.sum(a1 * sel, axis=1)
    c2 = jnp.sum(a2 * sel, axis=1)
    cw = jnp.sum(aw * sel, axis=1)
    sl = pl.ds(ty * 8, 8)
    better = cid > acc[sl, :]
    acc[sl, :] = jnp.where(better, cid, acc[sl, :])
    for k, c in enumerate((c0, c1, c2, cw)):
        s2 = pl.ds(ty * 8 + 128 * (k + 1), 8)
        acc[s2, :] = jnp.where(better, c, acc[s2, :])
    return carry


def d_eval4(big, i, acc, carry):
    recs = recs_of(big, i)
    py, ty = py_of(i)
    tot = jnp.zeros((8, 128), jnp.float32)
    for s in range(4):
        cov, a0, a1, a2, aw = eval_slot(recs, py, s)
        tot = tot + cov * a0 + a1 * a2 + aw
    sl = pl.ds(ty * 8, 8)
    acc[sl, :] = acc[sl, :] + tot
    return carry


def d_mm(big, i, acc, carry):
    recs = recs_of(big, i)
    py, ty = py_of(i)
    off = jax.lax.rem(i, 4) * 128
    lhsA = big[pl.ds(off, 48), :]
    lhsB = big[pl.ds(off, 32), :]
    WA = jnp.zeros((48, 128), jnp.float32)
    WB = jnp.zeros((32, 128), jnp.float32)
    gb = jnp.zeros((8, 128), jnp.float32)
    for s in range(4):
        P = big[pl.ds(off + s, 128), :]
        WA = WA + hi_dot(lhsA, P)
        WB = WB + hi_dot(lhsB, P)
        gb = gb + hi_dot(WA[0:8, :], P)
    sl = pl.ds(ty * 8, 8)
    acc[sl, :] = acc[sl, :] + WA[0:8, :] + WB[0:8, :] + gb
    return carry


def d_full(big, i, acc, carry):
    recs = recs_of(big, i)
    py, ty = py_of(i)
    colT = recs[25, :].reshape(1, 128).T
    xio = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    grp = lane // 24
    pw = jnp.exp2((lane - grp * 24).astype(jnp.float32))

    WA = jnp.zeros((48, 128), jnp.float32)
    WB = jnp.zeros((32, 128), jnp.float32)
    kill = jnp.zeros((8, 128), jnp.float32)
    for s in range(4):
        cov, a0, a1, a2, aw = eval_slot(recs, py, s)
        bm = cov * pw
        for g in range(6):
            acc[pl.ds(96 + g * 8, 8), :] = bm * (grp == g).astype(jnp.float32)
        lhsA = acc[96:144, :]
        P = ((colT + jnp.float32(s)) == xio).astype(jnp.float32)
        WA = WA + hi_dot(lhsA, P)
        acc[pl.ds(160, 8), :] = cov * a0
        acc[pl.ds(168, 8), :] = cov * a1
        acc[pl.ds(176, 8), :] = cov * a2
        acc[pl.ds(184, 8), :] = cov * aw
        WB = WB + hi_dot(acc[160:192, :], P)
        kill = kill + hi_dot(WA[0:8, :], P)
    win = jnp.full((8, 128), -1.0, jnp.float32)
    for g in range(6):
        gm = WA[g * 8:(g + 1) * 8, :]
        bits = pltpu.bitcast(gm, jnp.int32)
        expo = (((bits >> 23) & 0xFF) - 127).astype(jnp.float32)
        win = jnp.where(gm > 0, expo + g * 24.0, win)
    sl = pl.ds(ty * 8, 8)
    better = win + kill * 0 > acc[sl, :]
    acc[sl, :] = jnp.where(better, win, acc[sl, :])
    sl2 = pl.ds(ty * 8 + 512, 8)
    acc[sl2, :] = jnp.where(better, WB[0:8, :], acc[sl2, :])
    return carry


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run(d_base, "d_base  ")
    run(d_strips, "d_strips")
    run(d_eval4, "d_eval4 ")
    run(d_mm, "d_mm    ")
    run(d_full, "d_full  ")

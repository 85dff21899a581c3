#!/usr/bin/env python3
"""Deposit-step cost, measured the way the real kernel runs:

- scalar fori carry, accumulators in VMEM scratch refs (strips.py style)
- every operand derived from a loop-variant dynamic slice (defeats hoisting)
- marginal costing: each variant adds one component.

Variants:
  b_base   : dynamic rec slice load + tiny scalar use + dyn RMW (8,128)
  b_eval1  : + 1-slot eval (coverage+4 varyings, 128 tris)
  b_eval4  : + 4-slot eval
  b_bm     : eval4 + bitmask LHS assembly (6 groups) stores
  b_tr     : base + (1,128)->(128,1) transpose of a loop-variant vector
  b_p1     : base + 1 one-hot P build (128,128) from loop-variant col
  b_mmA    : base + (48,128)@(128,128) matmul on loop-variant operands
  b_full   : eval4 + P builds(4, shifted) + A(48x4 via 4 mm) + GB(4 mm 8x128)
             + B(32x4 via 4 mm) + extract + 2 dyn RMW merges
"""
import functools
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

NSTEP = 4096


def hi_dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def run(body_factory, name, n=6):
    def kernel(big_ref, o_ref, acc_ref):
        def step(i, carry):
            return body_factory(big_ref, i, acc_ref, carry)
        out = jax.lax.fori_loop(0, NSTEP, step, jnp.float32(0.0))
        o_ref[...] = acc_ref[0:8, :] + out

    rng = np.random.default_rng(2)
    big = rng.standard_normal((512, 128)).astype(np.float32)
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
    print(f"{name}: {dt*1e9:.0f} ns/step")
    return dt


def recs_of(big_ref, i):
    off = jax.lax.rem(i, 8) * 32
    return big_ref[pl.ds(off, 32), :]          # (32,128) loop-variant


def eval_slot(recs, py, s):
    def col(k):
        return recs[k, :].reshape(1, 128)
    px = col(25) + (jnp.float32(s) + 0.5)
    f0 = col(2) * (px - col(0)) - col(3) * (py - col(1))
    f1 = col(6) * (px - col(4)) - col(7) * (py - col(5))
    f2 = col(10) * (px - col(8)) - col(11) * (py - col(9))
    aw = f0 * col(21) + f1 * col(22) + f2 * col(23)
    az = f0 * col(25) + f1 * col(26) + f2 * col(27)
    cov = ((f0 >= 0.) & (f1 >= 0.) & (f2 >= 0.) & (az >= 0.)
           & (aw > 0.) & (aw - az >= 0.)).astype(jnp.float32)
    a0 = f0 * col(12) + f1 * col(13) + f2 * col(14)
    a1 = f0 * col(15) + f1 * col(16) + f2 * col(17)
    a2 = f0 * col(18) + f1 * col(19) + f2 * col(20)
    return cov, a0, a1, a2, aw


def py_of(i):
    dy = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(jnp.float32)
    ty = jax.lax.rem(i, 64)
    return dy + (ty * 8).astype(jnp.float32) + 0.5, ty


def b_base(big, i, acc, carry):
    recs = recs_of(big, i)
    py, ty = py_of(i)
    sl = pl.ds(ty * 8, 8)
    acc[sl, :] = acc[sl, :] + recs[0:8, :] + py
    return carry


def b_eval1(big, i, acc, carry):
    recs = recs_of(big, i)
    py, ty = py_of(i)
    cov, a0, a1, a2, aw = eval_slot(recs, py, 0)
    sl = pl.ds(ty * 8, 8)
    acc[sl, :] = acc[sl, :] + cov * a0 + a1 * a2 + aw
    return carry


def b_eval4(big, i, acc, carry):
    recs = recs_of(big, i)
    py, ty = py_of(i)
    tot = jnp.zeros((8, 128), jnp.float32)
    for s in range(4):
        cov, a0, a1, a2, aw = eval_slot(recs, py, s)
        tot = tot + cov * a0 + a1 * a2 + aw
    sl = pl.ds(ty * 8, 8)
    acc[sl, :] = acc[sl, :] + tot
    return carry


def b_bm(big, i, acc, carry):
    recs = recs_of(big, i)
    py, ty = py_of(i)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    grp = lane // 24
    pw = jnp.exp2((lane - grp * 24).astype(jnp.float32))
    for s in range(4):
        cov, a0, a1, a2, aw = eval_slot(recs, py, s)
        bm = cov * pw
        for g in range(6):
            gm = bm * (grp == g).astype(jnp.float32)
            acc[pl.ds(64 + g * 8, 8), :] = gm
    sl = pl.ds(ty * 8, 8)
    acc[sl, :] = acc[sl, :] + acc[64:72, :]
    return carry


def b_tr(big, i, acc, carry):
    recs = recs_of(big, i)
    py, ty = py_of(i)
    colT = recs[25, :].reshape(1, 128).T       # (128,1) loop-variant
    sl = pl.ds(ty * 8, 8)
    acc[sl, :] = acc[sl, :] + colT[0:8, :] + py
    return carry


def b_p1(big, i, acc, carry):
    recs = recs_of(big, i)
    py, ty = py_of(i)
    colT = recs[25, :].reshape(1, 128).T
    xio = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1).astype(jnp.float32)
    P = (colT == xio).astype(jnp.float32)
    sl = pl.ds(ty * 8, 8)
    acc[sl, :] = acc[sl, :] + P[0:8, :] + py
    return carry


def b_mmA(big, i, acc, carry):
    recs = recs_of(big, i)
    py, ty = py_of(i)
    off = jax.lax.rem(i, 4) * 128
    lhs = big[pl.ds(off, 48), :]
    P = big[pl.ds(off, 128), :]
    W = hi_dot(lhs, P)
    sl = pl.ds(ty * 8, 8)
    acc[sl, :] = acc[sl, :] + W[0:8, :] + py
    return carry


def b_full(big, i, acc, carry):
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
        # assemble LHS_A (6 bitmask groups x 8dy) -- here 6 stores
        for g in range(6):
            acc[pl.ds(96 + g * 8, 8), :] = bm * (grp == g).astype(jnp.float32)
        lhsA = acc[96:144, :]
        P = ((colT + jnp.float32(s)) == xio).astype(jnp.float32)
        WA = WA + hi_dot(lhsA, P)
        # pass B LHS: 4 channels x 8dy
        acc[pl.ds(160, 8), :] = cov * a0
        acc[pl.ds(168, 8), :] = cov * a1
        acc[pl.ds(176, 8), :] = cov * a2
        acc[pl.ds(184, 8), :] = cov * aw
        lhsB = acc[160:192, :]
        WB = WB + hi_dot(lhsB, P)
        kill = kill + hi_dot(py * 0.001, P.T)   # stand-in gather-back (8,128)@(128,128)
    # extract winner rel from 6 bitmask groups
    win = jnp.full((8, 128), -1.0, jnp.float32)
    for g in range(6):
        gm = WA[g * 8:(g + 1) * 8, :]
        bits = pltpu.bitcast(gm, jnp.int32)
        expo = (((bits >> 23) & 0xFF) - 127).astype(jnp.float32)
        win = jnp.where(gm > 0, expo + g * 24.0, win)
    sl = pl.ds(ty * 8, 8)
    better = win > acc[sl, :]
    acc[sl, :] = jnp.where(better, win + kill * 0, acc[sl, :])
    sl2 = pl.ds(ty * 8 + 512, 8)
    acc[sl2, :] = jnp.where(better, WB[0:8, :], acc[sl2, :])
    return carry


if __name__ == "__main__":
    print("devices:", jax.devices())
    run(b_base, "b_base  (dyn slice + dyn RMW)")
    run(b_eval1, "b_eval1 (+1-slot eval)")
    run(b_eval4, "b_eval4 (+4-slot eval)")
    run(b_bm, "b_bm    (eval4 + 24 bitmask stores)")
    run(b_tr, "b_tr    (+transpose (1,128)->(128,1))")
    run(b_p1, "b_p1    (+transpose + 1 P build)")
    run(b_mmA, "b_mmA   (+(48,128)@(128,128) mm)")
    run(b_full, "b_full  (everything, 12 mm)")

#!/usr/bin/env python3
"""Find the per-iteration floor of fori_loop bodies in Mosaic.

  c_scalar   : scalar-only body (carry += f(i))
  c_slice    : + dynamic (32,128) VMEM read
  c_rmwf     : + RMW at FIXED offset
  c_rmwd     : + RMW at dynamic offset (rem-based)
  c_rmwd_and : same but offset via (i & 63) (no rem)
  c_u4       : b_base-equivalent work x4 logical steps in one iteration
  c_u8       : x8
  c_eval4_u4 : full 4-slot eval + RMW, 4 logical steps per iteration
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

NSTEP = 4096


def run(body_factory, name, steps_per_iter=1, n=6):
    niter = NSTEP // steps_per_iter

    def kernel(big_ref, o_ref, acc_ref):
        def step(i, carry):
            return body_factory(big_ref, i, acc_ref, carry)
        out = jax.lax.fori_loop(0, niter, step, jnp.float32(0.0))
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
    print(f"{name}: {dt*1e9:.0f} ns/logical-step "
          f"({dt*steps_per_iter*1e9:.0f} ns/iter)")
    return dt


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


def c_scalar(big, i, acc, carry):
    return carry + jax.lax.rem(i, 64).astype(jnp.float32)


def c_slice(big, i, acc, carry):
    off = jax.lax.rem(i, 8) * 32
    recs = big[pl.ds(off, 32), :]
    return carry + recs[0, 0]


def c_rmwf(big, i, acc, carry):
    off = jax.lax.rem(i, 8) * 32
    recs = big[pl.ds(off, 32), :]
    acc[0:8, :] = acc[0:8, :] + recs[0:8, :]
    return carry


def c_rmwd(big, i, acc, carry):
    off = jax.lax.rem(i, 8) * 32
    recs = big[pl.ds(off, 32), :]
    ty = jax.lax.rem(i, 64)
    sl = pl.ds(ty * 8, 8)
    acc[sl, :] = acc[sl, :] + recs[0:8, :]
    return carry


def c_rmwd_and(big, i, acc, carry):
    off = (i & 7) * 32
    recs = big[pl.ds(off, 32), :]
    sl = pl.ds((i & 63) * 8, 8)
    acc[sl, :] = acc[sl, :] + recs[0:8, :]
    return carry


def make_u(k):
    def body(big, i, acc, carry):
        for j in range(k):
            ii = i * k + j
            off = jax.lax.rem(ii, 8) * 32
            recs = big[pl.ds(off, 32), :]
            ty = jax.lax.rem(ii, 64)
            sl = pl.ds(ty * 8, 8)
            acc[sl, :] = acc[sl, :] + recs[0:8, :]
        return carry
    return body


def make_eval4_u(k):
    def body(big, i, acc, carry):
        dy = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(jnp.float32)
        for j in range(k):
            ii = i * k + j
            off = jax.lax.rem(ii, 8) * 32
            recs = big[pl.ds(off, 32), :]
            ty = jax.lax.rem(ii, 64)
            py = dy + (ty * 8).astype(jnp.float32) + 0.5
            tot = jnp.zeros((8, 128), jnp.float32)
            for s in range(4):
                cov, a0, a1, a2, aw = eval_slot(recs, py, s)
                tot = tot + cov * a0 + a1 * a2 + aw
            sl = pl.ds(ty * 8, 8)
            acc[sl, :] = acc[sl, :] + tot
        return carry
    return body


if __name__ == "__main__":
    print("devices:", jax.devices())
    run(c_scalar, "c_scalar  ")
    run(c_slice, "c_slice   ")
    run(c_rmwf, "c_rmwf    ")
    run(c_rmwd, "c_rmwd    ")
    run(c_rmwd_and, "c_rmwd_and")
    run(make_u(4), "c_u4      ", steps_per_iter=4)
    run(make_u(8), "c_u8      ", steps_per_iter=8)
    run(make_eval4_u(1), "c_eval4_u1", steps_per_iter=1)
    run(make_eval4_u(4), "c_eval4_u4", steps_per_iter=4)
    run(make_eval4_u(8), "c_eval4_u8", steps_per_iter=8)

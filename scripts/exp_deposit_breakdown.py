#!/usr/bin/env python3
"""Breakdown of the deposit-step cost + exactness at HIGHEST precision.

Variants (all loop NSTEP times in ONE kernel over VMEM-resident data so
dispatch overhead amortizes away):
  v_eval   : eval only (4 slots x 8dy x 128 tris), accumulate locally
  v_pbuild : P build only (4 one-hot (128,128) compares)
  v_mm4    : 4 separate (80,128)@(128,128) matmuls (fixed operands)
  v_mm1    : 1 fused (80,512)@(512,128) matmul
  v_mm48   : 1 fused (48,512)@(512,128) matmul (bitmask-only pass A)
  v_gb     : gather-back (8,128)@(128,512) matmul
  v_full   : eval + P + A(48,512) + GB + B(32,512) + extract + merge
  v_tr     : in-loop (1,128)->(128,1) transpose cost
E_exact    : single-contributor exactness with precision=HIGHEST
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
REC = 32


def hi_dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def run_kernel(body, name, nstep=NSTEP, n=6):
    """body(recs (REC,128) array, i, acc_ref) -> (8,128) contribution."""
    def kernel(rt_ref, o_ref, acc_ref):
        recs = rt_ref[...]

        def step(i, carry):
            return body(recs, i, acc_ref, carry)

        out = jax.lax.fori_loop(0, nstep, step, jnp.zeros((8, 128), jnp.float32))
        o_ref[...] = out + acc_ref[0:8, :]

    rng = np.random.default_rng(2)
    recs = rng.standard_normal((REC, 128)).astype(np.float32)
    recs[25] = rng.integers(0, 124, 128).astype(np.float32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1024, 128), jnp.float32)],
    )
    jf = jax.jit(f)
    x = jnp.asarray(recs)
    out = jf(x)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(x)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / n / nstep
    print(f"{name}: {dt*1e9:.0f} ns/step")
    return dt


def eval_channels(recs, py, s):
    def col(k):
        return recs[k, :].reshape(1, 128)
    px = col(25) + (s + 0.5)
    f0 = col(2) * (px - col(0)) - col(3) * (py - col(1))
    f1 = col(6) * (px - col(4)) - col(7) * (py - col(5))
    f2 = col(10) * (px - col(8)) - col(11) * (py - col(9))
    cov = ((f0 >= 0.) & (f1 >= 0.) & (f2 >= 0.)).astype(jnp.float32)
    a0 = f0 * col(12) + f1 * col(13) + f2 * col(14)
    a1 = f0 * col(15) + f1 * col(16) + f2 * col(17)
    a2 = f0 * col(18) + f1 * col(19) + f2 * col(20)
    aw = f0 * col(21) + f1 * col(22) + f2 * col(23)
    return cov, a0, a1, a2, aw


def main():
    print("devices:", jax.devices())

    def dy_iota():
        return jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(jnp.float32)

    def v_eval(recs, i, acc, carry):
        dy = dy_iota()
        ty = jax.lax.rem(i, 64)
        py = dy + (ty * 8).astype(jnp.float32) + 0.5
        tot = carry
        for s in range(4):
            cov, a0, a1, a2, aw = eval_channels(recs, py, s)
            tot = tot + cov * a0 + a1 + a2 * aw
        return tot

    def v_pbuild(recs, i, acc, carry):
        px0c = recs[25, :].reshape(1, 128).T  # hoisted? no: per step
        xio = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1).astype(jnp.float32)
        tot = carry
        for s in range(4):
            P = (px0c + jnp.float32(s) == xio).astype(jnp.float32)
            tot = tot + P[0:8, :]
        return tot

    def v_tr(recs, i, acc, carry):
        col = (recs[25, :].reshape(1, 128) + jnp.float32(i)).T  # (128,1)
        return carry + col[0:8, 0].reshape(8, 1)

    # fixed matmul operands from scratch memory
    def v_mm4(recs, i, acc, carry):
        lhs = acc[0:80, :]
        tot = carry
        for s in range(4):
            P = acc[pl.ds(128 + 128 * s, 128), :]
            W = hi_dot(lhs, P)
            tot = tot + W[0:8, :]
        return tot

    def v_mm1(recs, i, acc, carry):
        # (80, 512) @ (512, 128): LHS as 4 horizontal chunks via scratch
        lhsT = acc[pl.ds(0, 512), :][:, 0:80]   # (512, 80) -> use dot_general
        P = acc[pl.ds(0, 512), :]               # (512, 128)
        W = jax.lax.dot_general(
            lhsT, P, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (80, 128)
        return carry + W[0:8, :]

    def v_mm48(recs, i, acc, carry):
        lhsT = acc[pl.ds(0, 512), :][:, 0:48]
        P = acc[pl.ds(0, 512), :]
        W = jax.lax.dot_general(
            lhsT, P, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (48, 128)
        return carry + W[0:8, :]

    def v_gb(recs, i, acc, carry):
        wrel = acc[0:8, :]                      # (8, 128)
        PT = acc[pl.ds(0, 128), :]              # (128, 128); x4 slots
        tot = carry
        W = hi_dot(wrel, PT)
        for s in range(3):
            W = hi_dot(W, PT)
        return carry + W

    def v_full(recs, i, acc, carry):
        dy = dy_iota()
        ty = jax.lax.rem(i, 64)
        py = dy + (ty * 8).astype(jnp.float32) + 0.5
        px0c = recs[25, :].reshape(1, 128).T
        xio = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1).astype(jnp.float32)
        # eval + assemble LHS_A (bitmask 6 groups x 8dy = 48 rows) per slot
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        grp = (lane // 24)
        rel = (lane - grp * 24).astype(jnp.float32)
        pw = jnp.exp2(rel)                       # 2^rel per lane
        for s in range(4):
            cov, a0, a1, a2, aw = eval_channels(recs, py, s)
            bm = cov * pw
            for g in range(6):
                gm = bm * (grp == g).astype(jnp.float32)
                acc[pl.ds(150 + s * 48 + g * 8, 8), :] = gm
            P = (px0c + jnp.float32(s) == xio).astype(jnp.float32)
            acc[pl.ds(350 + 0, 128), :] = P      # last slot P kept
        # pass A matmul (48, 512)@(512,128) via transposed layout
        lhsT = acc[pl.ds(150, 48), :]            # stand-in shapes
        PA = acc[pl.ds(350, 128), :]
        WA = hi_dot(lhsT, PA)                    # (48, 128)
        # extract winner rel: 6-group log2 chain
        win = jnp.zeros((8, 128), jnp.float32)
        for g in range(6):
            gm = WA[pl.dslice(g * 8, 8) if False else slice(g * 8, g * 8 + 8), :]
            bits = pltpu.bitcast(gm, jnp.int32)
            expo = (((bits >> 23) & 0xFF) - 127).astype(jnp.float32)
            win = jnp.where(gm > 0, expo + g * 24, win)
        # gather-back (8,128)@(128,128) x4
        kill = jnp.zeros((8, 128), jnp.float32)
        for s in range(4):
            kill = kill + hi_dot(win, PA)
        # pass B: varyings 4ch x 8dy = 32 rows, one matmul
        lhsB = acc[pl.ds(150, 32), :]
        WB = hi_dot(lhsB, PA)                    # (32, 128)
        # merge into acc strip at dynamic offset
        sl = pl.ds(ty * 8, 8)
        better = win > acc[sl, :]
        acc[sl, :] = jnp.where(better, win, acc[sl, :])
        return carry + WB[0:8, :] + kill

    run_kernel(v_eval, "v_eval   (4 slots eval only)")
    run_kernel(v_pbuild, "v_pbuild (4x onehot build + T)")
    run_kernel(v_tr, "v_tr     ((1,128)->(128,1) transpose)")
    run_kernel(v_mm4, "v_mm4    (4x (80,128)@(128,128))")
    run_kernel(v_mm1, "v_mm1    ((80,512)T@(512,128))")
    run_kernel(v_mm48, "v_mm48   ((48,512)T@(512,128))")
    run_kernel(v_gb, "v_gb     (4x (8,128)@(128,128))")
    run_kernel(v_full, "v_full   (eval+P+A+GB+B+extract+merge)")

    # ---- exactness with HIGHEST ----
    rng = np.random.default_rng(0)
    M, K, N = 80, 128, 128
    vals = (rng.standard_normal((M, K)) *
            np.exp(rng.uniform(-20, 20, (M, K)))).astype(np.float32)
    P = np.zeros((K, N), np.float32)
    P[np.arange(K), rng.permutation(K)] = 1.0   # permutation: zero collisions

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = hi_dot(a_ref[...], b_ref[...])

    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
    out = np.asarray(jax.device_get(f(jnp.asarray(vals), jnp.asarray(P))))
    ref = vals @ P
    exact = True
    for k in range(K):
        n = int(np.argmax(P[k]))
        if not np.array_equal(out[:, n], vals[:, k]):
            bad = np.where(out[:, n] != vals[:, k])[0][:3]
            print("  mismatch ex:", vals[bad[0], k], out[bad[0], n])
            exact = False
            break
    print(f"E_exact HIGHEST single-contrib bitexact={exact}")


if __name__ == "__main__":
    main()

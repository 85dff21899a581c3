#!/usr/bin/env python3
"""Micro-experiments for the deposit-kernel design (dense-mesh raster v2).

Questions:
  E1: does in-kernel jnp.dot((96,128)@(128,128), f32) produce EXACT results
      when one operand is a 0/1 one-hot matrix and the other carries f32
      values (incl. 2^k bitmask sums)? Timing per call?
  E2: does jnp.transpose / .T work in-kernel for (1,128)->(128,1) and
      (8,128)->(128,8)? cost?
  E3: lane rotate (pltpu.roll / manual) support + cost.
  E4: exponent extraction: floor(log2(x)) via bitcast >> 23 exactness for
      x = sum of distinct powers of two (bitmask -> winner rel).
  E5: timing of the full deposit inner step at realistic shapes.

Run on TPU. Batch everything in ONE process (tunnel compiles are slow).
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

import vulkan_forge  # noqa: F401  (enables compile cache)


def timed(fn, *args, n=50):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n, out


# ---------------- E1: one-hot matmul exactness ----------------

def e1():
    rng = np.random.default_rng(0)
    M, K, N = 96, 128, 128
    # vals: realistic f32s incl. bitmask sums of powers of 2
    vals = rng.standard_normal((M, K)).astype(np.float32) * np.exp(
        rng.uniform(-20, 20, (M, K))).astype(np.float32)
    rels = rng.integers(0, 24, K)
    vals[0, :] = (2.0 ** rels).astype(np.float32)   # bitmask-ish row
    # P: one-hot (each row of P has exactly one 1 at a random col)
    P = np.zeros((K, N), np.float32)
    P[np.arange(K), rng.integers(0, N, K)] = 1.0

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.float32)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    dt, out = timed(jax.jit(f), jnp.asarray(vals), jnp.asarray(P))
    ref = vals @ P  # numpy f64 then cast? use exact: one-hot => gather-sum
    # exact reference: out[m, n] = sum of vals[m, k] where P[k, n] == 1
    ref = np.zeros((M, N), np.float64)
    for k in range(K):
        n = int(np.argmax(P[k]))
        ref[:, n] += vals[:, k].astype(np.float64)
    out_np = np.asarray(jax.device_get(out))
    # where no collision (single contributor), must be bit-exact
    counts = P.sum(axis=0)
    single = counts == 1
    exact_single = True
    for n in np.where(single)[0]:
        k = int(np.argmax(P[:, n]))
        if not np.array_equal(out_np[:, n], vals[:, k]):
            exact_single = False
            break
    # bitmask row: sum of distinct 2^rel must be exact integer sum
    bm_ref = np.zeros(N)
    for k in range(K):
        n = int(np.argmax(P[k]))
        bm_ref[n] += float(vals[0, k])
    bm_exact = np.array_equal(out_np[0], bm_ref.astype(np.float32))
    print(f"E1 dot(96,128)@(128,128): {dt*1e6:.1f} us/call, "
          f"single-contrib bitexact={exact_single}, bitmask exact={bm_exact}")


# ---------------- E2: in-kernel transpose ----------------

def e2():
    def kernel(a_ref, o_ref):
        o_ref[...] = a_ref[...].T

    for shape in [(1, 128), (8, 128), (32, 128)]:
        try:
            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape[::-1], jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            x = jnp.asarray(np.random.rand(*shape).astype(np.float32))
            dt, out = timed(jax.jit(f), x)
            ok = np.array_equal(np.asarray(jax.device_get(out)),
                                np.asarray(jax.device_get(x)).T)
            print(f"E2 transpose {shape}: {dt*1e6:.1f} us/call, correct={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"E2 transpose {shape}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


# ---------------- E3: lane rotate ----------------

def e3():
    def kernel(a_ref, o_ref):
        x = a_ref[...]
        try:
            r = pltpu.roll(x, 5, 1)
        except AttributeError:
            r = jnp.roll(x, 5, axis=1)
        o_ref[...] = r

    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        x = jnp.asarray(np.random.rand(8, 128).astype(np.float32))
        dt, out = timed(jax.jit(f), x)
        ref = np.roll(np.asarray(jax.device_get(x)), 5, axis=1)
        ok = np.array_equal(np.asarray(jax.device_get(out)), ref)
        print(f"E3 lane roll: {dt*1e6:.1f} us/call, correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"E3 lane roll: FAILED {type(e).__name__}: {str(e)[:200]}")


# ---------------- E4: exponent extraction ----------------

def e4():
    def kernel(a_ref, o_ref):
        x = a_ref[...]
        bits = pltpu.bitcast(x, jnp.int32)
        expo = ((bits >> 23) & 0xFF) - 127
        o_ref[...] = expo.astype(jnp.float32)

    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        rng = np.random.default_rng(1)
        masks = np.zeros((8, 128), np.float32)
        for i in range(8):
            for j in range(128):
                nbits = rng.integers(1, 5)
                rels = rng.choice(24, nbits, replace=False)
                masks[i, j] = np.sum(2.0 ** rels)
        dt, out = timed(jax.jit(f), jnp.asarray(masks))
        ref = np.floor(np.log2(masks)).astype(np.float32)
        ok = np.array_equal(np.asarray(jax.device_get(out)), ref)
        print(f"E4 exponent extract: {dt*1e6:.1f} us/call, correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"E4 exponent extract: FAILED {type(e).__name__}: {str(e)[:200]}")


# ---------------- E5: deposit inner-step timing ----------------

def e5():
    """Realistic inner step: eval 128 tris x 4 slots x 8 dy + 4 matmuls,
    looped NSTEP times inside one kernel over VMEM-resident data."""
    NSTEP = 2048
    REC = 32

    def kernel(rt_ref, o_ref, acc0, acc1):
        recs = rt_ref[...]                      # (REC, 128) tri-major cols
        px0 = recs[25, :].reshape(1, 128)       # stamped x-origin
        # transpose px0 to sublanes for P build
        px0_col = px0.T                          # (128, 1)
        xio = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1).astype(jnp.float32)
        dy = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(jnp.float32)

        def col(k):
            return recs[k, :].reshape(1, 128)

        def step(i, carry):
            ty = jax.lax.rem(i, 64)
            py = dy + (ty * 8).astype(jnp.float32) + 0.5
            total = jnp.zeros((8, 128), jnp.float32)
            for s in range(4):
                px = px0 + (s + 0.5)
                f0 = col(2) * (px - col(0)) - col(3) * (py - col(1))
                f1 = col(6) * (px - col(4)) - col(7) * (py - col(5))
                f2 = col(10) * (px - col(8)) - col(11) * (py - col(9))
                cov = ((f0 >= 0.) & (f1 >= 0.) & (f2 >= 0.)).astype(jnp.float32)
                a0 = f0 * col(12) + f1 * col(13) + f2 * col(14)
                a1 = f0 * col(15) + f1 * col(16) + f2 * col(17)
                a2 = f0 * col(18) + f1 * col(19) + f2 * col(20)
                aw = f0 * col(21) + f1 * col(22) + f2 * col(23)
                # 10 channels x 8 dy rows = 80 rows of LHS
                lhs = jnp.concatenate([
                    cov * a0, cov * a1, cov * a2, cov * aw, cov,
                    cov * a0, cov * a1, cov * a2, cov * aw, cov,
                ], axis=0)                       # (80, 128)
                P = (px0_col + jnp.float32(s) == xio).astype(jnp.float32)
                W = jnp.dot(lhs, P, preferred_element_type=jnp.float32)
                total = total + W[0:8, :] + W[40:48, :]
            sl = pl.ds(ty * 8, 8)
            acc0[sl, :] = acc0[sl, :] + total
            return carry

        jax.lax.fori_loop(0, NSTEP, step, 0)
        o_ref[...] = acc0[0:8, :]

    rng = np.random.default_rng(2)
    recs = rng.standard_normal((REC, 128)).astype(np.float32)
    recs[25] = rng.integers(0, 124, 128).astype(np.float32)
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((512, 128), jnp.float32),
                            pltpu.VMEM((512, 128), jnp.float32)],
        )
        x = jnp.asarray(recs)
        dt, out = timed(jax.jit(f), x, n=10)
        per_step = dt / NSTEP
        print(f"E5 deposit step (128tri x 4slot x 8dy + 4 matmuls): "
              f"{per_step*1e9:.0f} ns/step ({dt*1e3:.2f} ms / {NSTEP})")
    except Exception as e:  # noqa: BLE001
        print(f"E5 deposit step: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for fn in [e1, e2, e3, e4, e5]:
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            print(f"{fn.__name__} crashed: {type(e).__name__}: {str(e)[:300]}")

#!/usr/bin/env python3
"""Probe: in-kernel (32, 128) -> (128, 32) transpose in Mosaic.

If supported and cheap (<~500 ns), the packed kernel can consume the
column matrix M directly via lane-sliced DMAs (exp_lane_dma: OK) and
transpose each 128-triangle slice in VMEM -- dropping the XLA stream
transpose AND the stream materialization from prep. Measures correctness
plus an amortized in-kernel loop cost (4096 iterations to swamp the
~4.7 ms dispatch overhead; CLAUDE.md benchmark trap 3)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k_correct(src_ref, out_ref):
    out_ref[...] = src_ref[...].T


def correctness():
    src = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
    f = pl.pallas_call(
        k_correct,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 32), jnp.float32),
    )
    try:
        got = np.asarray(jax.device_get(f(src)))
        ok = np.array_equal(got, np.asarray(src).T)
        print("in-kernel (32,128) transpose:", "OK" if ok else "WRONG")
        return ok
    except Exception as e:
        print("in-kernel transpose FAILED:",
              type(e).__name__, str(e).splitlines()[0][:200])
        return False


def k_loop(src_ref, out_ref, *, iters, transpose):
    # dynamic sublane slice per iteration so Mosaic cannot hoist the
    # transpose out of the loop
    def body(i, acc):
        v = src_ref[pl.ds(jax.lax.rem(i, 4) * 32, 32), :]   # (32, 128)
        if transpose:
            v = v.T                                         # (128, 32)
            acc = acc + jnp.sum(v, axis=1).reshape(1, 128)
        else:
            acc = acc + jnp.sum(v, axis=0).reshape(1, 128)
        return acc
    acc = jax.lax.fori_loop(0, iters, body,
                            jnp.zeros((1, 128), jnp.float32))
    out_ref[...] = acc


def loop_cost(transpose, iters=4096):
    import functools
    src = jnp.arange(4 * 32 * 128, dtype=jnp.float32).reshape(128, 128)
    f = jax.jit(pl.pallas_call(
        functools.partial(k_loop, iters=iters, transpose=transpose),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    ))
    jax.device_get(f(src))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_get(f(src * 1.000001))
    dt = (time.perf_counter() - t0) / 3
    print(f"loop {'with' if transpose else 'without'} transpose: "
          f"{dt*1e9/iters:8.1f} ns/iter")
    return dt


if __name__ == "__main__":
    if correctness():
        base = loop_cost(False)
        wt = loop_cost(True)

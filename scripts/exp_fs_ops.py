#!/usr/bin/env python3
"""Bit-parity probe: do Mosaic's transcendental lowerings match XLA's?

The vtx in-kernel fragment-epilogue fusion (docs/NEXT.md round-5) is only
shippable if every op the shipped FS uses produces IDENTICAL bits inside a
pallas kernel and in the XLA epilogue it replaces -- the pallas-vs-jnp
same-device byte-identity invariant is pinned by tests/test_goldens.py.
Arithmetic (+ - * / select compare) is IEEE-exact everywhere; the risky
ops are the transcendentals: sin, cos, sqrt, rsqrt-pattern 1/sqrt,
pow(x, 1/2.4) (sRGB encode), exp, log (pow-composition fallback).

Prints per-op: max ulp delta + mismatch count between a pallas kernel and
jit'ed XLA on the same device, over realistic FS input ranges.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 256, 128
N = ROWS * LANES


def make_inputs():
    rng = np.random.default_rng(7)
    # sin/cos args: world x,z up to +-16 scaled by 1.3 -> +-21
    trig = rng.uniform(-21.0, 21.0, N).astype(np.float32)
    # pow/sqrt args: linear rgb values and 1+slope^2 terms
    unit = rng.uniform(0.0, 1.0, N).astype(np.float32)
    unit[:8] = [0.0, 1.0, 0.0031308, 0.0031309, 0.5, 0.25, 1e-6, 0.99999]
    pos = (1.0 + rng.uniform(0.0, 4.0, N) ** 2).astype(np.float32)
    return (trig.reshape(ROWS, LANES), unit.reshape(ROWS, LANES),
            pos.reshape(ROWS, LANES))


OPS = {
    "sin": lambda t, u, p: jnp.sin(t * jnp.float32(1.3)),
    "cos": lambda t, u, p: jnp.cos(t * jnp.float32(1.3)),
    "sqrt": lambda t, u, p: jnp.sqrt(p),
    "inv_sqrt": lambda t, u, p: 1.0 / jnp.sqrt(p),
    "rsqrt": lambda t, u, p: jax.lax.rsqrt(p),
    "pow_srgb": lambda t, u, p: jnp.power(u, jnp.float32(1.0 / 2.4)),
    "exp": lambda t, u, p: jnp.exp(u * jnp.float32(-3.0)),
    "log": lambda t, u, p: jnp.log(p),
    "exp_log_pow": lambda t, u, p: jnp.exp(
        jnp.log(jnp.maximum(u, jnp.float32(1e-30))) * jnp.float32(1.0 / 2.4)),
}


def main():
    t, u, p = make_inputs()
    tj, uj, pj = jnp.asarray(t), jnp.asarray(u), jnp.asarray(p)
    dev = jax.devices()[0].platform
    print(f"device: {dev}")

    for name, fn in OPS.items():
        def kernel(t_ref, u_ref, p_ref, o_ref, fn=fn):
            o_ref[...] = fn(t_ref[...], u_ref[...], p_ref[...])

        try:
            got_pl = jax.device_get(pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
            )(tj, uj, pj))
        except Exception as e:
            print(f"{name:12s} PALLAS-FAIL: {str(e).splitlines()[0][:140]}")
            continue
        got_xla = jax.device_get(jax.jit(fn)(tj, uj, pj))
        a = got_pl.view(np.int32).astype(np.int64)
        b = got_xla.view(np.int32).astype(np.int64)
        ulp = np.abs(a - b)
        nm = int((ulp != 0).sum())
        print(f"{name:12s} mismatches={nm:7d}/{N}  max_ulp={int(ulp.max())}"
              + ("  BIT-EXACT" if nm == 0 else ""))


if __name__ == "__main__":
    main()

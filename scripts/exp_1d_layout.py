#!/usr/bin/env python3
"""Is a (T,) f32 elementwise chain slower than the same math 2-D-shaped?

Hypothesis (docs/NEXT.md lever 1): R1 arrays lay out as (1, T) rows padded
to 8 sublanes -> 8x physical traffic for every materialized (T,) vector,
which would explain prep M's measured ~25x-paper cost. Three variants of
an identical 20-op elementwise graph producing 8 outputs from 6 inputs:
  1d      (T,) vectors
  2d_wide (T//1024, 1024) -- lane-tile-aligned rows
  2d_sq   (4096, T//4096)
Sum-forced; varying inputs per rep (memoization trap)."""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

T = 2 * 1023 * 1024          # split-grid triangle count at grid=1024
REPS = 3

rng = np.random.default_rng(0)


def make(shape, seed):
    r = np.random.default_rng(seed)
    return tuple(jnp.asarray(r.random(shape, np.float32)) for _ in range(6))


def graph(a, b, c, d, e, f):
    # ~the op mix of _setup_cols_fields per column: mul/sub/add chains
    f0 = a * (b - c) - d * (e - f)
    f1 = c * (d - a) - e * (f - b)
    f2 = e * (f - a) - b * (c - d)
    s = f0 + f1 + f2
    o0 = f0 * s + f1
    o1 = f1 * s + f2
    o2 = f2 * s + f0
    o3 = o0 * o1 - o2
    o4 = jnp.where(s > 0, o0, o1)
    o5 = jnp.maximum(o2, o3)
    o6 = o4 * o5 + s
    o7 = o6 - o0
    return (o0, o1, o2, o3, o4, o5, o6, o7)


@jax.jit
def run(ins):
    outs = graph(*ins)
    acc = jnp.float32(0)
    for o in outs:
        acc = acc + jnp.sum(o)
    return acc


def timeit(name, shape):
    sets = [make(shape, s) for s in range(REPS + 1)]
    jax.device_get(run(sets[-1]))
    t0 = time.perf_counter()
    for r in range(REPS):
        jax.device_get(run(sets[r]))
    dt = (time.perf_counter() - t0) / REPS
    gb = T * 4 * (6 + 8) / 1e9
    print(f"{name:8s} {dt*1e3:8.2f} ms  ({gb/dt:6.1f} GB/s paper)",
          flush=True)


if __name__ == "__main__":
    timeit("1d", (T,))
    timeit("2d_wide", (T // 1024, 1024))
    timeit("2d_sq", (4096, T // 4096))

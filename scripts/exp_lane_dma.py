#!/usr/bin/env python3
"""Feasibility probe: can Mosaic DMA a 128-lane-aligned LANE SLICE of a
wide HBM array ((rows, N) -> (rows, 128) at lane offset l0 = k*128)?

If yes, the packed prep's 4-D transpose (M -> stream, ~30-55 ms/frame at
grid=1024) can be dropped: the kernel could fetch M[:, l0:l0+128] slabs
directly (tris on lanes). Prints OK + checksum match, or the Mosaic error.
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(src_hbm, out_ref, scratch, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(i * 128, 128)], scratch, sem)
    cp.start()
    cp.wait()
    out_ref[...] = scratch[...] * 2.0


def main():
    rows, nlanes = 32, 1024
    src = jnp.arange(rows * nlanes, dtype=jnp.float32).reshape(rows, nlanes)
    out_shape = jax.ShapeDtypeStruct((rows * (nlanes // 128), 128),
                                     jnp.float32)
    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nlanes // 128,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=out_shape,
    )
    try:
        got = np.asarray(jax.device_get(f(src)))
        want = np.asarray(src).reshape(rows, nlanes // 128, 128) \
            .transpose(1, 0, 2).reshape(-1, 128) * 2.0
        print("lane-sliced DMA OK, match:", np.array_equal(got, want))
    except Exception as e:
        print("lane-sliced DMA FAILED:", type(e).__name__,
              str(e).splitlines()[0][:200])


if __name__ == "__main__":
    main()

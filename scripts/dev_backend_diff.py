#!/usr/bin/env python3
"""Find the TPU/CPU divergent op behind the renderer_extended golden gap.

tests/test_goldens.py::renderer_extended_96x96 hashes differently on CPU
(e6be6cf7...) vs the TPU-pinned golden (f4b80954...) at EVERY round-3
commit -- the divergence predates round 3 and breaks the all-backends
byte-identity invariant on the extended FS path only (the shipped-FS
goldens agree). This script feeds IDENTICAL inputs to both backends and
bitwise-compares: (1) the full extended FS, (2) each suspect primitive
(1/sqrt fusion under --xla_allow_excess_precision, sqrt, divide, pow,
exp2, bilinear LUT). Run on a machine with the axon TPU visible.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def both(fn, *args):
    """Run jitted fn on TPU and CPU with identical inputs; return both."""
    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    outs = []
    for dev in (tpu, cpu):
        with jax.default_device(dev):
            da = [jax.device_put(a, dev) for a in args]
            outs.append(np.asarray(jax.device_get(jax.jit(fn)(*da))))
    return outs


def cmp(name, a, b):
    if np.array_equal(a, b):
        print(f"{name:28s} IDENTICAL")
        return True
    d = a != b
    n = int(d.sum())
    ia = a.view(np.int32) if a.dtype == np.float32 else a
    ib = b.view(np.int32) if b.dtype == np.float32 else b
    ulp = int(np.abs(ia.astype(np.int64) - ib.astype(np.int64)).max())
    print(f"{name:28s} DIFFERS: {n}/{a.size} elems, max ulp {ulp}")
    return False


def main():
    rng = np.random.default_rng(3)
    x = (rng.uniform(0.01, 30.0, 4096).astype(np.float32))
    y = (rng.uniform(0.01, 4.0, 4096).astype(np.float32))

    print("== primitives ==")
    a, b = both(lambda v: jnp.sqrt(v), x)
    cmp("sqrt", a, b)
    a, b = both(lambda v: 1.0 / jnp.sqrt(v), x)
    cmp("1/sqrt (fusable->rsqrt)", a, b)
    a, b = both(lambda u, v: u / v, x, y)
    cmp("divide", a, b)
    a, b = both(lambda v: v / (1.0 + v), x)
    cmp("reinhard x/(1+x)", a, b)
    a, b = both(lambda v: jnp.power(v, jnp.float32(1 / 2.4)), y)
    cmp("pow(x, 1/2.4)", a, b)
    a, b = both(lambda v: jnp.exp2(v), y)
    cmp("exp2", a, b)
    a, b = both(lambda v: jnp.log(v), y)
    cmp("log", a, b)

    print("== extended FS on identical gbuffer ==")
    from vulkan_forge._raster import fragment
    from vulkan_forge import _colormap
    H, W = 96, 96
    h = rng.uniform(0.0, 40.0, (H, W)).astype(np.float32)
    u = rng.uniform(0.0, 1.0, (H, W)).astype(np.float32)
    v = rng.uniform(0.0, 1.0, (H, W)).astype(np.float32)
    mask = rng.uniform(size=(H, W)) > 0.3
    heights = (np.outer(np.linspace(0, 1, 32), np.linspace(0, 1, 48))
               * 40).astype(np.float32) * 1.5
    lut, _ = _colormap.build_lut("viridis")
    sun = np.array([0.35, 0.81, -0.35], np.float32)

    def fs(hh, uu, vv, mm, ht):
        return fragment.terrain_fs_extended(
            hh, uu, vv, mm, jnp.asarray(lut), ht, jnp.float32(0.0),
            jnp.float32(60.0), jnp.float32(1.2), jnp.asarray(sun),
            jnp.float32(10.0), jnp.float32(1.5))

    a, b = both(fs, h, u, v, mask, heights)
    cmp("terrain_fs_extended", a, b)

    print("== shipped FS control ==")

    def fs2(hh, uu, vv, mm):
        return fragment.terrain_fs(hh, uu, vv, mm, jnp.asarray(lut),
                                   jnp.float32(60.0), jnp.float32(1.2),
                                   jnp.asarray(sun))

    a, b = both(fs2, h, u, v, mask)
    cmp("terrain_fs (shipped)", a, b)


if __name__ == "__main__":
    main()

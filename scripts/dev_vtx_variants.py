#!/usr/bin/env python3
"""Byte-identity check of the VF_VTX_VARIANT trip bodies (docs/NEXT.md
round-3d experiment queue) against the shipped variant, plus -- on real
hardware -- a timed bake-off. Usage:
    python scripts/dev_vtx_variants.py [grid] [W] [H] [slots] [B] [reps]
CPU: runs under VF_VTX_INTERPRET=1 automatically (identity only).
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 48
W = int(sys.argv[2]) if len(sys.argv) > 2 else 96
H = int(sys.argv[3]) if len(sys.argv) > 3 else 64
SLOTS = int(sys.argv[4]) if len(sys.argv) > 4 else 6
B = int(sys.argv[5]) if len(sys.argv) > 5 else 1
REPS = int(sys.argv[6]) if len(sys.argv) > 6 else 0

# Optional 7th arg: comma-separated variant subset (fresh 1024 compiles are
# ~3 min each through the tunnel, so run one variant per bounded command;
# "shipped" names the default body). Identity vs shipped is only checked
# when shipped is in the subset.
VARIANTS = ("", "recompute_p", "fcache", "concat_lhs")
if len(sys.argv) > 7:
    VARIANTS = tuple("" if s in ("", "shipped") else s
                     for s in sys.argv[7].split(","))


def main():
    import jax
    import jax.numpy as jnp
    from vulkan_forge import _mesh
    from vulkan_forge._camera import look_at_rh, perspective_wgpu
    from vulkan_forge._raster import transform, vtx
    from vulkan_forge._raster.setup import clip_to_fb

    if jax.devices()[0].platform == "cpu":
        os.environ.setdefault("VF_VTX_INTERPRET", "1")
        print("CPU: interpret mode, identity check only")

    xyuv_np, idx_np = _mesh.build_grid_xyuv(GRID)
    xyuv = jnp.asarray(xyuv_np)
    heights = jnp.zeros((1, 1), jnp.float32)
    view = jnp.asarray(look_at_rh((3.0, 2.0, 3.0), (0, 0, 0), (0, 1, 0)))
    proj = jnp.asarray(perspective_wgpu(
        np.float32(math.radians(45.0)), np.float32(W / H),
        np.float32(0.1), np.float32(100.0)))
    def fields_for(eye):
        view_r = jnp.asarray(look_at_rh(eye, (0, 0, 0), (0, 1, 0)))
        clip, vary = transform.terrain_vs(xyuv, heights, view_r, proj,
                                          jnp.float32(1.0), jnp.float32(1.0))
        x, y, z, w = clip_to_fb(clip, W, H)
        zero = jnp.zeros_like(x)
        fields = (x, y, w, vary[:, 0], vary[:, 1], vary[:, 2], z, zero)
        return tuple(jnp.broadcast_to(f, (B,) + f.shape) for f in fields)

    fields_b = fields_for((3.0, 2.0, 3.0))
    # Distinct camera per timed rep (identical inputs are memoized upstream
    # and measure nothing -- CLAUDE.md benchmark trap 1).
    rep_fields = [fields_for((3.0 * math.cos(0.4 + 0.13 * r), 2.0,
                              3.0 * math.sin(0.4 + 0.13 * r)))
                  for r in range(REPS)]

    # Returning the raw (B, H', 128) g-buffers from the jit makes XLA stage
    # the pallas outputs through scoped VMEM, which OOMs the compile at
    # grid=1024 (measured: 20.65M vs the 16M scoped limit). The timed path
    # therefore reduces in-jit exactly like dev_vtx_perf.py; raw arrays are
    # fetched for byte-identity only at small grids where the compile fits.
    fetch_raw = GRID <= 256

    def timed_frame(fields_b):
        (v0, v1, v2, m), needed = vtx.render_gbuffer_vtx_batch(
            fields_b, GRID, W, H, slots=SLOTS)
        return (jnp.sum(v0), jnp.sum(v1), jnp.sum(v2), jnp.sum(m), needed)

    results = {}
    for v in VARIANTS:
        os.environ["VF_VTX_VARIANT"] = v
        fn = jax.jit(timed_frame)
        t0 = time.perf_counter()
        try:
            sums = jax.device_get(fn(fields_b))
            if fetch_raw:
                (v0, v1, v2, m), needed = vtx.render_gbuffer_vtx_batch(
                    fields_b, GRID, W, H, slots=SLOTS)
                got = jax.device_get((v0, v1, v2, m, needed))
            else:
                got = sums
        except Exception as e:
            # An OOM/compile failure is a measured verdict, not a reason to
            # lose the rest of the bake-off (fcache's extra scratch can
            # exceed scoped VMEM at large grids).
            msg = str(e).splitlines()[0][:200]
            print(f"[{v or 'shipped'}] FAILED: {msg}")
            results[v] = None
            continue
        dt0 = time.perf_counter() - t0
        print(f"[{v or 'shipped'}] first run (incl compile): {dt0:.1f}s "
              f"needed={float(got[4])}")
        if REPS:
            # No warm call: fn is already compiled from the fields_b run
            # above (rep fields share its shapes), and warming with
            # rep_fields[0] would make the first timed rep a repeat
            # dispatch of identical inputs -- memoized upstream, so a
            # bogus ~0 ms would become the best-of headline.
            times = []
            for fb in rep_fields:
                t0 = time.perf_counter()
                jax.device_get(fn(fb))
                times.append(time.perf_counter() - t0)
            dt = min(times) / B * 1000
            print(f"[{v or 'shipped'}] {dt:.1f} ms/frame best-of-{REPS} "
                  f"(all: {' '.join(f'{t / B * 1000:.1f}' for t in times)})")
        results[v] = got

    ref = results.get("")
    if "" not in results:
        bad = any(r is None for r in results.values())
        print("VARIANTS FAIL" if bad else
              "VARIANTS OK (timed only, no shipped reference in subset)")
        return 1 if bad else 0
    ok = ref is not None
    for v in VARIANTS:
        if v == "":
            continue
        got = results[v]
        if got is None or ref is None:
            print(f"[{v}] skipped identity (variant or shipped failed)")
            continue
        for name, a, b in zip(("v0", "v1", "v2", "mask", "needed"),
                              ref, got):
            same = np.array_equal(np.asarray(a), np.asarray(b))
            ok &= same
            if not same:
                print(f"[{v}] {name}: MISMATCH")
        kind = "byte" if fetch_raw else "checksum"
        print(f"[{v}] {kind}-identical to shipped: "
              f"{all(np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(ref, got))}")
    print("VARIANTS OK" if ok else "VARIANTS FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

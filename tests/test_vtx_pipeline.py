"""vtx pipeline plumbing: eligibility gate + slots ratchet (CPU-checkable)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vulkan_forge._raster import pipeline as P


def _grid_indices(n):
    from vulkan_forge import _mesh
    _xy, idx = _mesh.build_grid_xyuv(n)
    return jnp.asarray(np.asarray(idx).astype(np.int32).reshape(-1, 3))


def test_vtx_ok_gate():
    idx64 = _grid_indices(64)
    assert P._vtx_ok(64, idx64, 800, 600)
    assert not P._vtx_ok(None, idx64, 800, 600)          # not a grid mesh
    assert not P._vtx_ok(63, idx64, 800, 600)            # wrong grid_n
    # drop a triangle: topology no longer the full grid
    assert not P._vtx_ok(64, idx64[:-1], 800, 600)
    # accumulator planes must fit VMEM: huge framebuffer fails the gate
    assert not P._vtx_ok(64, idx64, 8192, 8192)


def test_vtx_slots_ratchet():
    key = (97, 321, 243)                                  # unused elsewhere
    assert P._vtx_slots(*key) == 4                        # default
    P._vtx_bump(*key, needed=5.0)
    assert P._vtx_slots(*key) == 8                        # next pow2 >= 5
    P._vtx_bump(*key, needed=6.0)                         # never shrinks
    assert P._vtx_slots(*key) == 16                       # cur*2 floor
    P._vtx_bump(*key, needed=100.0)
    assert P._vtx_slots(*key) >= 100
    P._VTX_RATCHET.pop(key, None)                         # leave no state

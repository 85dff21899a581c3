"""Shared test helpers.

``requires_tpu`` skips tests that exercise the Pallas kernels: those
lower only on the TPU backend ("Only interpret mode is supported on CPU
backend"). On a CPU-only machine the jnp-path tests (oracles, goldens
with per-device pins, math/geometry, tools) still run; the cross-backend
identity claims are untestable there and skip with a clear reason.
"""
from __future__ import annotations

import pytest


def _has_tpu() -> bool:
    try:
        import jax
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


HAS_TPU = _has_tpu()

requires_tpu = pytest.mark.skipif(
    not HAS_TPU, reason="pallas kernels lower only on the TPU backend")

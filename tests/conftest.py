"""Shared test helpers.

``requires_tpu`` skips tests that exercise the Pallas kernels: those
lower only on the TPU backend ("Only interpret mode is supported on CPU
backend"). On a CPU-only machine the jnp-path tests (oracles, goldens
with per-device pins, math/geometry, tools) still run; the cross-backend
identity claims are untestable there and skip with a clear reason.
"""
from __future__ import annotations

import os
import sys

import pytest


def _relay_hint_dead() -> bool:
    """TCP-level hint that the remote device relay is gone (a refused
    connection on the relay port means the first jax backend touch blocks
    forever). Mirrors vulkan_forge._device.relay_hint_dead but imports
    NOTHING jax-adjacent -- it must run before any of that initializes."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return False
    if os.environ.get("PALLAS_AXON_POOL_IPS") == "":
        return False
    import socket
    addr = os.environ.get("VF_AXON_RELAY", "127.0.0.1:8103")
    host, _, port = addr.rpartition(":")
    try:
        with socket.create_connection((host or "127.0.0.1", int(port)),
                                      timeout=2.0):
            return False
    except (OSError, ValueError):
        return True


def _force_cpu_if_tunnel_dead() -> None:
    """A dead device relay hangs the first backend touch forever
    (CLAUDE.md), which would wedge pytest mid-run. jax latches
    JAX_PLATFORMS from the environment when it is IMPORTED, so this must
    run before anything jax-adjacent loads (that is why _relay_hint_dead
    above is a socket-only re-implementation rather than an import of
    vulkan_forge._device): when the relay is gone, force the CPU platform
    in the environment now, and -- belt and braces -- push it into a
    live jax.config too if some plugin imported jax first."""
    if not _relay_hint_dead():
        return
    sys.stderr.write("tests/conftest.py: device relay unreachable -- "
                     "forcing JAX_PLATFORMS=cpu for this run\n")
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    if "jax" in sys.modules:
        sys.modules["jax"].config.update("jax_platforms", "cpu")


_force_cpu_if_tunnel_dead()


def _has_tpu() -> bool:
    try:
        import jax
        from vulkan_forge import _device
        ok, val, timed_out = _device._with_deadline(jax.devices, 120.0)
        if timed_out or not ok:
            return False
        return val[0].platform != "cpu"
    except Exception:
        return False


HAS_TPU = _has_tpu()

requires_tpu = pytest.mark.skipif(
    not HAS_TPU, reason="pallas kernels lower only on the TPU backend")

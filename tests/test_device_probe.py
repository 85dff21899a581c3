"""Device probe taxonomy, including the dead-plugin watchdog.

A remote device plugin whose tunnel dies mid-session makes backend init
block forever (observed live); the probe must convert that hang into an
honest {status: error, message: timed out} instead of hanging the
diagnostics CLI. Parity anchor for the taxonomy: src/lib.rs:779-845.
"""
from __future__ import annotations

import time

import vulkan_forge as vf
from vulkan_forge import _device


def test_probe_legacy_backends_unsupported():
    for b in ("VULKAN", "DX12", "METAL", "GL"):
        r = vf.device_probe(b)
        assert r["status"] == "unsupported"
        assert "millis" in r


def test_probe_current_platform_ok():
    r = vf.device_probe()
    assert r["status"] == "ok", r
    assert r["millis"] > 0
    assert r["device_type"] in ("Tpu", "Cpu")


def test_probe_times_out_instead_of_hanging(monkeypatch):
    import jax
    monkeypatch.setattr(_device, "_PROBE_TIMEOUT_S", 2.0)
    monkeypatch.setattr(jax, "devices", lambda *a: time.sleep(3600))
    t0 = time.perf_counter()
    r = _device.device_probe("AUTO")
    took = time.perf_counter() - t0
    assert r["status"] == "error"
    assert "timed out" in r["message"]
    assert took < 10.0


def test_enumerate_adapters_times_out_empty(monkeypatch):
    import jax
    monkeypatch.setattr(_device, "_PROBE_TIMEOUT_S", 2.0)
    monkeypatch.setattr(jax, "devices", lambda *a: time.sleep(3600))
    assert _device.enumerate_adapters() == []

"""CLI tools (contract: reference tests/test_diagnostics.py,
tests/test_backends.py, tests/test_perf.py -- same env gates)."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=1100):
    # Generous timeout: child processes may wait on the TPU device lock
    # while other tests hold it, plus cold XLA compiles.
    return subprocess.run([sys.executable] + args, cwd=REPO, timeout=timeout,
                          capture_output=True, text=True)


def test_device_diagnostics_cli(tmp_path):
    out = tmp_path / "diag.json"
    r = _run(["python/tools/device_diagnostics.py", "--json", str(out)])
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.loads(out.read_text())
    assert "adapters" in rep and "probes" in rep
    assert all(p["status"] in ("ok", "unsupported", "error") for p in rep["probes"])
    assert any(p["status"] == "ok" for p in rep["probes"])


def test_determinism_harness_cli(tmp_path):
    r = _run(["python/tools/determinism_harness.py", "--width", "48",
              "--height", "32", "--runs", "2", "--out-dir", str(tmp_path)])
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.loads((tmp_path / "determinism_report.json").read_text())
    assert rep["deterministic"] is True


@pytest.mark.skipif(os.environ.get("VF_TEST_PERF") != "1",
                    reason="enable with VF_TEST_PERF=1")
def test_perf_sanity_cli(tmp_path):
    out = tmp_path / "perf.json"
    r = _run(["python/tools/perf_sanity.py", "--width", "64", "--height", "64",
              "--runs", "5", "--warmups", "1", "--json", str(out)])
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.loads(out.read_text())
    assert {"width", "height", "init_ms", "steady"} <= set(rep)
    assert {"mean_ms", "median_ms", "p95_ms"} <= set(rep["steady"])


@pytest.mark.skipif(os.environ.get("VF_TEST_BACKENDS") != "1",
                    reason="enable with VF_TEST_BACKENDS=1")
def test_backends_runner_cli(tmp_path):
    r = _run(["python/tools/backends_runner.py", "--width", "48", "--height",
              "32", "--runs", "1", "--require-same", "--out-dir", str(tmp_path)],
             timeout=580)
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.loads((tmp_path / "backends_report.json").read_text())
    assert rep["at_least_one_ok"]
    assert rep["cross_backend_equal"]

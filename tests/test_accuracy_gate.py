"""Executability guard for the accuracy gate (`accuracy_gate.py --smoke`).

The gate is the one command that reproduces the reference eval table
(conversion -> band-coverage audit -> eval -> verdict vs BASELINE.md;
reference flow `/root/reference/main.py:163-211`). Real weights/data are
not available in CI, so this runs the smoke path — a synthetic torch-format
image checkpoint pushed through the exact production loading chain and a
synthetic VIS eval — as a subprocess and asserts it stays executable.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_accuracy_gate_smoke_subprocess():
    env = dict(os.environ)
    # match the suite's platform: virtual CPU, persistent compile cache
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=1").strip()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "accuracy_gate.py"), "--smoke"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f"gate smoke failed (rc={proc.returncode}):\n{out[-4000:]}"
    assert "== accuracy gate ==" in out, out[-4000:]
    assert "gate path executed end-to-end" in out, out[-4000:]
    assert "smoke: PASS" in out, out[-4000:]

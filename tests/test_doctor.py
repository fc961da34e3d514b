"""Environment self-check CLI (``python -m zsgnet_tpu.doctor``).

The doctor must (a) pass on this CI environment with the CPU platform,
(b) report every capability row, and (c) never hang — its backend probe
runs on a watchdog thread precisely because a dead remote-TPU tunnel
hangs ``jax.devices()`` forever (observed repeatedly on this repo's
axon tunnel; SURVEY.md §2.13 env/setup)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doctor_passes_on_cpu():
    out = subprocess.run(
        [sys.executable, "-m", "zsgnet_tpu.doctor", "--platform=cpu"],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    for row in ("jax", "config", "backend", "jit smoke",
                "native image pipeline", "scratch dir"):
        assert row in out.stdout, f"missing doctor row {row!r}:\n{out.stdout}"
    assert "all required checks passed" in out.stdout


def test_doctor_inprocess_main():
    """main() is importable and returns 0 on CPU (no subprocess), so the
    checks compose into other tooling."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from zsgnet_tpu.doctor import main

    assert main(["--platform=cpu", "--smoke=false"]) == 0

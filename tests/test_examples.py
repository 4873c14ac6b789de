"""Examples must keep working (CPU, tiny shapes, interpret-mode kernels)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_orbit_demo_smoke(tmp_path):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=REPO,
    )
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "orbit_demo.py"),
            "--width", "64", "--spp", "1", "--depth", "2", "--frames", "2",
            "--out-dir", str(tmp_path), "--backend", "pallas",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    frames = sorted(p.name for p in tmp_path.iterdir())
    assert len(frames) == 2, frames
    assert "fps warm" in out.stdout

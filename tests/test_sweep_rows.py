"""Sweep-block-size invariance (RT_SWEEP_ROWS) for the flat sphere path.

The flat block-major sweep's packed keys carry ABSOLUTE row ids
(``blk_ids + base`` under an n_pad-derived mask), so the closest-hit result
-- and therefore the whole render -- must be byte-identical no matter how
the padded table is cut into sweep blocks. Smaller blocks additionally
activate the per-block conservative cull on a 512-row cover-scale scene
(n_pad 512 = 4 blocks at RT_SWEEP_ROWS=128), which is exactly the
candidate configuration of the round-3 hardware block-size A/B
(scripts: /tmp/campaign3.sh cover-blk128/256) -- this test pre-validates
its bit-transparency on the CPU interpret kernel so hardware time is never
spent on a divergent variant.

RT_SWEEP_ROWS is an import-time knob (validated at module load), so each
block size runs in a hermetic subprocess (CLAUDE.md: children must drop
the axon sitecustomize and pin JAX_PLATFORMS=cpu or a tunnel outage hangs
them); the parent compares the printed image hashes.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import dataclasses, hashlib, os, sys

import numpy as np

import jax
import raytracing_tpu as rt

cam, scene = rt.make_world_stress(488, seed=5, image_width=64)
params = dataclasses.replace(
    cam, image_width=64, samples_per_pixel=2, max_depth=4
)
for kind in ("sphere", "box", "0"):
    os.environ["RT_CULL"] = kind
    jax.clear_caches()
    r = rt.Renderer(scene, params, seed=0, backend="pallas")
    img = np.asarray(r.render())
    print(
        "RESULT",
        kind,
        hashlib.sha256(img.tobytes()).hexdigest(),
        r.segments_traced,
        flush=True,
    )
"""


def _render_hashes(sweep_rows: int) -> dict[str, tuple[str, str]]:
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "RT_SWEEP_ROWS": str(sweep_rows),
    }
    out = subprocess.run(
        [sys.executable, "-c", _CHILD],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = {}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            _, kind, digest, segs = line.split()
            res[kind] = (digest, segs)
    assert set(res) == {"sphere", "box", "0"}, out.stdout
    return res


@pytest.mark.slow
def test_flat_sweep_block_size_invariance():
    """128/256/512-row sweep blocks and every cull kind render the
    identical image (cover-scale 512-row scene; 512 = the single-block
    production default, 128/256 = the multi-block + cull candidates)."""
    per_blk = {blk: _render_hashes(blk) for blk in (128, 256, 512)}
    flat = {
        (blk, kind): v
        for blk, res in per_blk.items()
        for kind, v in res.items()
    }
    assert len(set(flat.values())) == 1, flat

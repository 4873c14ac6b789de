"""Time the two-level closest hit at large N under the surviving knobs.

Times trace_rays_fused (depth 1 -- exactly one _bounce_core per ray) on a
stress scene. Knobs: RT_SWEEP_ROWS / RT_WIN / RT_TWO_LEVEL_MIN /
RT_GATHER / RT_TWO_LEVEL_MXU / RT_CULL (see trace._knob).

History: an RT_ABLATE hook (stage1 / stage2 kernel variants) lived in the
production kernel during the round-2 stage-1 anomaly investigation; the
anomaly was SOLVED (per-group dynamic-base load re-issue -- CLAUDE.md) and
the hook was removed from trace.py in round 3. The measured ablation
numbers are recorded in CLAUDE.md's kernel perf log.

Usage: RT_WIN=64 python scripts/probe_two_level.py --spheres 2048
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

from raytracing_tpu.ops.pallas import trace as ptrace
from raytracing_tpu.scene.config import make_world_stress


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spheres", type=int, default=2048)
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--depth", type=int, default=1)
    args = ap.parse_args()
    _, scene = make_world_stress(args.spheres)
    b = args.rays
    k = jax.random.PRNGKey(0)
    o = jax.random.normal(k, (b, 3), jnp.float32) * 5.0 + jnp.array(
        [0.0, 3.0, 0.0]
    )
    d = jax.random.normal(jax.random.PRNGKey(1), (b, 3), jnp.float32)

    def run(seed):
        rad, seg = ptrace.trace_rays_fused(
            scene, o, d, jnp.int32(seed), jnp.int32(0), args.depth
        )
        return rad, seg

    rad, seg = run(0)
    rad.block_until_ready()
    best = 1e30
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        rad, seg = run(i + 1)  # vary seed: the tunnel dedupes identical runs
        _ = float(jnp.sum(rad))  # force a real round-trip fetch
        dt = time.perf_counter() - t0
        times.append(dt)
        best = min(best, dt)
    print("  times(ms):", [round(t * 1e3, 1) for t in times])
    segs = float(seg)
    cyc = best * 0.94e9 / segs
    knobs = " ".join(
        f"{k}={os.environ[k]}"
        for k in (
            "RT_SWEEP_ROWS", "RT_WIN", "RT_TWO_LEVEL_MIN", "RT_GATHER",
            "RT_TWO_LEVEL_MXU", "RT_CULL",
        )
        if k in os.environ
    )
    print(
        f"knobs=[{knobs}] "
        f"N={args.spheres} depth={args.depth}: {best*1e3:8.2f} ms, "
        f"{segs/1e6:.2f} Mseg -> {cyc:6.1f} cyc/seg, "
        f"{segs/best/1e6:7.2f} Mray/s"
    )


if __name__ == "__main__":
    main()

"""HW measurement: converge-while-interactive at the reference's shipped
workload (round-5; VERDICT r4 "What's missing" items 1-2).

The reference app is an interactive window in which a paused camera's render
progressively converges live (``/root/reference/src/main.cc:733-774``,
``src/ray.tracer.image.display.cc:108-117``); its shipped config is
1200-wide @ 8 spp (``data/config/world.config.json:4-6``). This script
drives the real ``InteractiveSession`` on hardware through two phases:

  1. ORBIT: one orbit keystroke per frame (camera moves every frame, the
     accumulation restarts each time) -- reports warm fps. Target >= 10.
  2. IDLE: no keys -- every frame folds more samples into the held pose.
     Reports the fps while converging, the wall-clock to reach the
     reference's 8-spp quality, and the wall-clock to the converge target.

Usage: python scripts/hw_interactive_converge.py [--width 1200] [--spp 2]
           [--depth 8] [--orbit-frames 60] [--converge-spp 64]
"""

from __future__ import annotations

import argparse
import dataclasses
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="data/config/world.config.json")
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--spp", type=int, default=2, help="samples per frame")
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--orbit-frames", type=int, default=60)
    ap.add_argument("--converge-spp", type=int, default=64)
    ap.add_argument("--out", default="/tmp/converge.png",
                    help="write the converged preview image here")
    args = ap.parse_args()

    import numpy as np

    import raytracing_tpu as rt
    from raytracing_tpu.runtime.interactive import InteractiveSession
    from raytracing_tpu.utils import png

    world = rt.load_world(args.config)
    params = dataclasses.replace(
        world.camera,
        image_width=args.width,
        samples_per_pixel=args.spp,
        max_depth=args.depth,
    )
    _, scene = rt.build_world(dataclasses.replace(world, camera=params))
    s = InteractiveSession(
        scene, params, seed=0, spp=args.spp,
        converge_spp=args.converge_spp, stream=io.StringIO(),
    )

    # Warmup: first frame pays the Mosaic compile.
    t0 = time.perf_counter()
    s.step("d")
    t_compile = time.perf_counter() - t0

    # Phase 1: orbit -- pose changes every frame, accumulation restarts.
    orbit_times = []
    for _ in range(args.orbit_frames):
        t0 = time.perf_counter()
        s.step("d")
        orbit_times.append(time.perf_counter() - t0)
        assert s.samples_at_pose == args.spp  # motion resets accumulation

    # Phase 2: idle -- the held pose converges; track the spp climb.
    idle_times = []
    t_idle0 = time.perf_counter()
    t_to_8 = None
    climb = []
    img = None
    while not s.converged:
        t0 = time.perf_counter()
        img = s.step()
        idle_times.append(time.perf_counter() - t0)
        climb.append(s.samples_at_pose)
        if t_to_8 is None and s.samples_at_pose >= 8:
            t_to_8 = time.perf_counter() - t_idle0
    t_converge = time.perf_counter() - t_idle0
    assert climb == sorted(climb) and climb[-1] == args.converge_spp, climb

    if img is not None:
        png.write_png(args.out, np.asarray(img))

    fps_orbit = 1.0 / (sum(orbit_times) / len(orbit_times))
    fps_idle = 1.0 / (sum(idle_times) / len(idle_times))
    h = s.renderer.camera.image_height
    print(json.dumps({
        "metric": "interactive_converge",
        "config": f"{args.width}x{h}@{args.spp}spp depth{args.depth} "
                  f"converge{args.converge_spp}",
        "fps_orbit_warm": round(fps_orbit, 2),
        "fps_idle_converging": round(fps_idle, 2),
        "s_to_reference_8spp": round(t_to_8, 3) if t_to_8 else None,
        "s_to_converge_target": round(t_converge, 3),
        "first_frame_s": round(t_compile, 2),
        "spp_climb_frames": len(climb),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

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
    ap.add_argument("--pipeline", type=int, default=2,
                    help="preview fetches in flight (0 = synchronous)")
    ap.add_argument("--out", default="/tmp/converge.png",
                    help="write the converged preview image here")
    ap.add_argument("--out-before", default=None,
                    help="also write the FIRST idle frame's preview (the "
                    "noisy pre-convergence state, for side-by-side docs)")
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
        converge_spp=args.converge_spp, pipeline=args.pipeline,
        stream=io.StringIO(),
    )

    # Warmup: compile BOTH kernel variants (a motion frame runs the
    # fresh-accumulation executable, an idle frame the accumulating one)
    # so neither phase's timing swallows a compile.
    t0 = time.perf_counter()
    s.step("d")
    s.step()
    s.flush()
    t_compile = time.perf_counter() - t0

    # Phase 1: orbit -- pose changes every frame, accumulation restarts.
    t_orbit0 = time.perf_counter()
    for _ in range(args.orbit_frames):
        s.step("d")
        assert s.samples_at_pose == args.spp  # motion resets accumulation
    s.flush()
    fps_orbit = args.orbit_frames / (time.perf_counter() - t_orbit0)

    # Phase 2: idle -- the held pose converges; track the spp climb.
    # (The pose carries the orbit phase's spp samples already.)
    t_idle0 = time.perf_counter()
    t_to_8 = None
    climb = []
    idle_frames = 0
    before = None
    while not s.converged:
        s.step()
        idle_frames += 1
        if before is None and args.out_before:
            before = s.flush()  # first idle frame = the noisy state
        climb.append(s.samples_at_pose)
        if t_to_8 is None and s.samples_at_pose >= 8:
            s.flush()  # count the presentation, not just the dispatch
            t_to_8 = time.perf_counter() - t_idle0
    img = s.flush()
    t_converge = time.perf_counter() - t_idle0
    assert climb == sorted(climb), climb
    assert not climb or climb[-1] == args.converge_spp, climb

    if img is not None:
        png.write_png(args.out, np.asarray(img))
    if before is not None:
        png.write_png(args.out_before, np.asarray(before))

    fps_idle = idle_frames / t_converge
    h = s.renderer.camera.image_height
    print(json.dumps({
        "metric": "interactive_converge",
        "config": f"{args.width}x{h}@{args.spp}spp depth{args.depth} "
                  f"converge{args.converge_spp}",
        "fps_orbit_warm": round(fps_orbit, 2),
        "fps_idle_converging": round(fps_idle, 2),
        # Growing idle chunks make fps misleading; spp/s is the honest
        # convergence rate.
        "spp_per_s_idle": round(
            (climb[-1] - args.spp) / t_converge, 1
        ) if climb else None,
        "s_to_reference_8spp": round(t_to_8, 3) if t_to_8 else None,
        "s_to_converge_target": round(t_converge, 3),
        "warmup_s": round(t_compile, 2),
        "pipeline": args.pipeline,
        "spp_climb_frames": len(climb),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

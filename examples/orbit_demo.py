"""Interactive progressive rendering demo: orbiting camera over the cover
scene (BASELINE.md config 5: >= 10 fps progressive accumulation on 1 chip).

The reference is an interactive application: a live window converges while
worker threads trace (SURVEY.md sections 2G/2I). This demo is the TPU
equivalent with a MOVING camera: every frame re-derives the thin-lens camera
on the orbit path, renders a low-spp progressive pass with the fused Pallas
megakernel, and presents it -- to the terminal (ANSI half-block), to numbered
PNGs via the native async frame pump (IO fully overlapped with device
compute), or both.

Because the camera is traced as jit ARGUMENTS (a `DerivedCamera` pytree of
arrays), moving it costs zero recompiles -- one compiled program serves every
frame.

Usage:
  python examples/orbit_demo.py [--width 640] [--spp 4] [--frames 120]
      [--out-dir /tmp/orbit] [--live] [--backend auto]
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="data/config/world.config.json")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--orbit-radius", type=float, default=13.4)
    ap.add_argument("--out-dir", help="write frame_NNNN.png per frame")
    ap.add_argument("--live", action="store_true", help="ANSI terminal view")
    ap.add_argument("--backend", default="auto")
    ap.add_argument(
        "--max-inflight", type=int, default=None,
        help="frames in flight before the dispatch loop waits on readback. "
        "Default: 3 for images under ~0.5 MB, else 0 -- measured on the "
        "remote-TPU tunnel, a device->host readback that overlaps the next "
        "dispatch collapses ~40x for payloads past ~0.5 MB (800x470: 5.2 "
        "fps serialized vs 0.1 fps pipelined) while small frames pipeline "
        "fine (512x301: 17.6 fps pipelined vs ~8 serialized)",
    )
    args = ap.parse_args()

    import numpy as np

    import raytracing_tpu as rt
    from raytracing_tpu.core import camera as rcamera
    from raytracing_tpu.runtime import display as rdisplay
    from raytracing_tpu.runtime.renderer import RenderProgress
    from raytracing_tpu.utils import native as rnative

    world = rt.load_world(args.config)
    params = dataclasses.replace(
        world.camera,
        image_width=args.width,
        samples_per_pixel=args.spp,
        max_depth=args.depth,
    )
    _, scene = rt.build_world(dataclasses.replace(world, camera=params))
    renderer = rt.Renderer(scene, params, seed=0, backend=args.backend)
    if args.max_inflight is None:
        # What is FETCHED per frame decides pipelining: full frames only
        # when recording (--out-dir); otherwise the tiny device-side
        # preview, which overlaps dispatch safely at any image size.
        frame_bytes = (
            params.image_width * params.image_height * 3
            if args.out_dir
            else 240 * 136 * 3
        )
        args.max_inflight = 3 if frame_bytes < 500_000 else 0
    # Pipeline depth is chosen adaptively: frames 1-3 run serialized to
    # calibrate a reference frame time, then the pipeline opens up to
    # max_inflight -- and collapses back permanently the moment a frame
    # blows past 3x the serialized reference. On the remote-TPU tunnel,
    # readbacks that overlap the next dispatch can collapse ~40x, and the
    # state varies over time; this keeps peak fps when the tunnel is
    # healthy and degrades to serialized (still interactive) when not.
    inflight = 0
    t_serial_ref = None

    pump = None
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        prefix = os.path.join(args.out_dir, "frame_")
        if rnative.available():
            pump = rnative.FramePump(prefix, queue_depth=8)
    term = rdisplay.TerminalDisplay() if args.live else None

    import concurrent.futures

    base_look = np.asarray(params.lookfrom, np.float64)
    elev = base_look[1]
    t_start = time.perf_counter()
    frame_times = []
    pending = []
    emit_pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)

    def emit(i, img):
        if pump is not None:
            if not pump.submit(img, i):
                # Queue full: write synchronously rather than drop the frame.
                from raytracing_tpu.utils import png

                png.write_png(
                    os.path.join(args.out_dir, f"frame_{i:04d}.png"), img
                )
        elif args.out_dir:
            from raytracing_tpu.utils import png

            png.write_png(
                os.path.join(args.out_dir, f"frame_{i:04d}.png"), img
            )
        if term is not None:
            term(
                RenderProgress(
                    samples_done=args.spp,
                    samples_total=args.spp,
                    pixels_count=renderer.pixels_count,
                    segments_traced=renderer.segments_traced,
                    elapsed_s=time.perf_counter() - t_start,
                    _preview=lambda im=img: im,
                )
            )

    try:
        for i in range(args.frames):
            theta = 2.0 * math.pi * i / args.frames
            lookfrom = (
                args.orbit_radius * math.cos(theta),
                elev,
                args.orbit_radius * math.sin(theta),
            )
            # Re-derive the camera for this frame and point the (already
            # compiled) renderer at it: DerivedCamera is a jit argument, so
            # no recompilation happens as it moves.
            renderer.params = dataclasses.replace(params, lookfrom=lookfrom)
            renderer.camera = rcamera.derive(renderer.params)

            t0 = time.perf_counter()
            # One fused dispatch per frame, no sync; readback + IO happen on
            # the emit worker thread while the device traces ahead. When not
            # recording full frames, only a device-downsampled preview is
            # fetched per frame (tens of KB): the full-frame fetch is what
            # caps large frames at ~5 fps (~1 MB over the tunnel cannot
            # overlap the next dispatch -- renderer._frame_preview_step).
            if args.out_dir:
                dev = renderer.render_frame(spp=args.spp)
                pending.append(
                    emit_pool.submit(
                        lambda i=i, d=dev: emit(i, renderer.fetch_image(d))
                    )
                )
            else:
                _, prev = renderer.render_frame_preview(spp=args.spp)
                pending.append(
                    emit_pool.submit(
                        lambda i=i, p=prev: emit(i, np.asarray(p))
                    )
                )
            while len(pending) > inflight:
                pending.pop(0).result()
            dt = time.perf_counter() - t0
            frame_times.append(dt)
            warm = frame_times[1:]
            if t_serial_ref is None:
                if len(warm) >= 3:
                    t_serial_ref = min(warm)
                    inflight = args.max_inflight  # open the pipeline
            elif inflight > 0 and dt > max(3.0 * t_serial_ref, 0.2):
                inflight = 0  # tunnel is concurrency-hostile: serialize
        for f in pending:
            f.result()
    finally:
        if pump is not None:
            pump.close()

    if not frame_times:
        print("no frames requested")
        return 0
    total = time.perf_counter() - t_start
    warm = frame_times[1:] or frame_times
    fps = 1.0 / max(sum(warm) / len(warm), 1e-9)
    print(
        f"\n{args.frames} frames {params.image_width}x{params.image_height} "
        f"@ {args.spp} spp in {total:.2f} s -- {fps:.1f} fps warm "
        f"(first frame {frame_times[0]:.2f} s incl. compile)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Command-line renderer: the application shell (SURVEY.md section 7, step 7).

The reference's CLI is vestigial (Lyra parsing fully commented out,
``/root/reference/src/main.cc:898-912``; the binary takes no arguments and
always renders ``data/config/world.config.json`` to a window). This shell
does it properly: scene file, size/spp/depth overrides, PNG output, live
terminal display, structured logging, profiler capture, checkpoint/resume.

Usage:
  python -m raytracing_tpu --config data/config/world.config.json \
      --width 1200 --spp 8 --out render.png --live
"""

from __future__ import annotations

import argparse
import dataclasses
import sys


def build_arg_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="raytracing_tpu",
        description="TPU-native progressive path tracer (RTiOW feature set).",
    )
    ap.add_argument(
        "--config",
        default="data/config/world.config.json",
        help="world/camera JSON (reference-compatible schema)",
    )
    ap.add_argument(
        "--stress",
        type=int,
        metavar="N",
        help="use the procedural N-sphere stress scene instead of --config",
    )
    ap.add_argument(
        "--gltf",
        action="append",
        default=[],
        metavar="PATH[:SCALE[:TX,TY,TZ]]",
        help="add every mesh primitive from a .gltf/.glb asset to the "
        "scene (repeatable); optional uniform scale and translation, e.g. "
        "--gltf model.glb:2.0:0,1,-3. pbrMetallicRoughness maps onto this "
        "framework's materials (the capability the reference vendored "
        "tinygltf for and never wired up)",
    )
    ap.add_argument("--out", default="render.png", help="output PNG path")
    ap.add_argument("--width", type=int, help="override image width")
    ap.add_argument("--spp", type=int, help="override samples per pixel")
    ap.add_argument("--depth", type=int, help="override max bounce depth")
    ap.add_argument("--seed", type=int, default=0, help="RNG seed")
    ap.add_argument(
        "--backend",
        choices=("auto", "pallas", "xla"),
        default="auto",
        help="integrator backend (auto: pallas on TPU, xla elsewhere)",
    )
    ap.add_argument(
        "--live",
        action="store_true",
        help="progressive ANSI display in the terminal while rendering",
    )
    ap.add_argument(
        "--interactive",
        action="store_true",
        help="keyboard-driven session (a/d orbit, w/s elevate, +/- zoom, "
        "ESC/x quit) instead of a one-shot render",
    )
    ap.add_argument(
        "--frames",
        type=int,
        help="with --interactive: stop after N frames (default: until quit)",
    )
    ap.add_argument(
        "--converge-spp",
        type=int,
        help="with --interactive: samples/pixel the held camera converges "
        "to while idle (default: max(64, --spp)); motion resets the "
        "accumulation",
    )
    ap.add_argument(
        "--pipeline",
        type=int,
        default=2,
        help="with --interactive: preview fetches in flight (presentation "
        "lags this many frames; 0 = synchronous). Overlapping the fetch "
        "with the next dispatch roughly doubles fps on the remote-TPU "
        "tunnel",
    )
    ap.add_argument(
        "--preview-dir",
        help="write preview_NNNN.png snapshots per progress event",
    )
    ap.add_argument(
        "--progress-every",
        type=int,
        default=1,
        help="progress/preview cadence in sample chunks",
    )
    ap.add_argument(
        "--log-dir",
        help="write a timestamped structured log file (quill analog)",
    )
    ap.add_argument(
        "--profile-dir",
        help="capture a jax.profiler trace of the render into this dir",
    )
    ap.add_argument(
        "--checkpoint",
        help="checkpoint file: loaded (if present) before rendering and "
        "saved after, enabling interrupted-render resume",
    )
    ap.add_argument(
        "--quiet", action="store_true", help="suppress the summary line"
    )
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_arg_parser().parse_args(argv)
    if args.checkpoint and not args.checkpoint.endswith(".npz"):
        # np.savez appends .npz on save; normalize so the resume existence
        # check and the saved file always agree.
        args.checkpoint += ".npz"
    args.progress_every = max(1, args.progress_every)

    from .utils import logging as rlogging

    log_path = None
    if args.log_dir:
        log_path = rlogging.setup(args.log_dir, console=False)
    log = rlogging.get_logger("cli")

    import os

    import raytracing_tpu as rt
    from .runtime import display as rdisplay
    from .utils import png as rpng

    if args.stress:
        if args.gltf:
            print("--gltf requires the config world (remove --stress)",
                  file=sys.stderr)
            return 2
        cam, scene = rt.make_world_stress(args.stress)
        source = f"stress:{args.stress}"
    else:
        world = rt.load_world(args.config)
        cam = world.camera
        source = args.config
    if args.width:
        cam = dataclasses.replace(cam, image_width=args.width)
    if args.spp:
        cam = dataclasses.replace(cam, samples_per_pixel=args.spp)
    if args.depth:
        cam = dataclasses.replace(cam, max_depth=args.depth)
    if not args.stress:
        world = dataclasses.replace(world, camera=cam)
        extra = None
        if args.gltf:
            def extra(builder, specs=tuple(args.gltf)):
                for spec in specs:
                    parts = spec.split(":")
                    path = parts[0]
                    scale = float(parts[1]) if len(parts) > 1 else 1.0
                    translate = (
                        tuple(float(x) for x in parts[2].split(","))
                        if len(parts) > 2
                        else (0.0, 0.0, 0.0)
                    )
                    builder.add_gltf(
                        path, scale=scale, translate=translate
                    )

        _, scene = rt.build_world(world, extra=extra)
    log.info(
        "scene %s: %d spheres, %d triangles; %dx%d @ %d spp depth %d",
        source, scene.num_objects, scene.num_triangles, cam.image_width,
        cam.image_height, cam.samples_per_pixel, cam.max_depth,
    )

    if args.interactive:
        from .runtime.interactive import InteractiveSession

        session = InteractiveSession(
            scene, cam, seed=args.seed, backend=args.backend,
            converge_spp=args.converge_spp, pipeline=args.pipeline,
        )
        frames = session.run(max_frames=args.frames)
        log.info("interactive session: %d frames", frames)
        if not args.quiet:
            print(f"\ninteractive session ended after {frames} frames")
        return 0

    renderer = rt.Renderer(scene, cam, seed=args.seed, backend=args.backend)

    resume = False
    if args.checkpoint and os.path.exists(args.checkpoint):
        done = renderer.load_checkpoint(args.checkpoint)
        resume = True
        log.info("resumed checkpoint %s at %d spp", args.checkpoint, done)

    callbacks = []
    if args.live:
        callbacks.append(rdisplay.TerminalDisplay())
    if args.preview_dir:
        callbacks.append(rdisplay.FileSequenceDisplay(args.preview_dir))
    on_progress = None
    if callbacks:
        def on_progress(p, _cbs=tuple(callbacks)):
            for cb in _cbs:
                cb(p)
    elif args.checkpoint:
        # Ctrl-C checkpointing persists completed chunks; keep the chunked
        # wave plan (a no-observer render would otherwise run as one wave
        # and have nothing to save mid-flight).
        def on_progress(p):
            pass

    profiler_cm = None
    if args.profile_dir:
        import jax

        profiler_cm = jax.profiler.trace(args.profile_dir)
        profiler_cm.__enter__()
        log.info("profiler trace -> %s", args.profile_dir)
    try:
        image = renderer.render(
            on_progress=on_progress,
            progress_every_chunks=args.progress_every,
            resume=resume,
        )
    except KeyboardInterrupt:
        # Clean Ctrl-C (SURVEY.md section 5.3 posture): persist progress if a
        # checkpoint path was given, then exit nonzero.
        if args.checkpoint and renderer.samples_done > 0:
            renderer.save_checkpoint(args.checkpoint)
            print(
                f"\ninterrupted; checkpoint saved at "
                f"{renderer.samples_done} spp -> {args.checkpoint}",
                file=sys.stderr,
            )
        return 130
    finally:
        if profiler_cm is not None:
            profiler_cm.__exit__(None, None, None)

    rpng.write_png(args.out, image)
    if args.checkpoint:
        renderer.save_checkpoint(args.checkpoint)
    log.info(
        "done: %s (%.2f s, %.1f Mrays/s, %d segments)",
        args.out, renderer.render_time(), renderer.mrays_per_sec(),
        renderer.segments_traced,
    )
    if not args.quiet:
        print(
            f"{args.out}: {image.shape[1]}x{image.shape[0]} "
            f"@ {renderer.samples_done} spp in {renderer.render_time():.2f} s "
            f"({renderer.mrays_per_sec():.1f} Mrays/s"
            + (f"; log {log_path}" if log_path else "")
            + ")"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

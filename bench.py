"""Benchmark: RTiOW cover-scene throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Workload (BASELINE.md throughput config, time-scaled): the 488-sphere cover
scene at 1920x1080, shipped camera; Mrays/s counts actually-traced path
segments (sum over bounces of alive rays -- the honest denominator, see
SURVEY.md section 3.3 cost model). vs_baseline is the ratio against the
500 Mrays/s/chip target from BASELINE.json (the reference itself publishes no
numbers -- BASELINE.md).

Measurement protocol: best of ``--repeats`` (default 5) fully-warm renders.
The remote-TPU tunnel's health oscillates ~2x over hours (CLAUDE.md
environment notes), so a single warm run is a coin flip -- round 2's driver
metric REGRESSED 85.5 -> 77.6 Mrays/s across a round that made the kernel
measurably faster. Each repeat uses a DIFFERENT seed: the tunnel dedupes
identical executions (same executable + same args can return instantly with
cached results), which would make repeat timings fraudulent. The best run is
reported (min wall over identical workloads estimates the uncontended rate;
the run-to-run spread is included as ``spread`` for transparency).

Usage: python bench.py [--spp N] [--depth N] [--width N] [--repeats N]
                       [--scene cover|textured|mesh[:S]|meshes[:K]|stress:N]
                       [--north-star]
       python bench.py --matrix [--out BENCH_FULL.json]
           runs the FULL BASELINE config matrix (cover@64, north star,
           textured, mesh:3, mesh:5, meshes:4, stress:2048, stress:8192
           -- 8 rows), one JSON row per config (the one documented
           exception to the single-line stdout contract), and writes the
           whole artifact to --out -- the one-command round-over-round
           regression ledger (VERDICT r4 item 4).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

# The tunnel to the remote TPU occasionally HANGS outright (a dispatch or
# fetch that never returns -- CLAUDE.md environment notes). A hung repeat
# must not swallow measurements that already completed: each render runs in
# a daemon worker thread with a deadline, and on a hang the bench reports
# the best completed run (or exits nonzero if nothing completed).
_WARMUP_DEADLINE_S = 2700.0   # fresh Mosaic compiles take up to ~25 min
_FIRST_RUN_DEADLINE_S = 1800.0

# The full-matrix rows: every BASELINE.md achieved-results config, so one
# command refreshes the whole ledger (spread included per row).
_MATRIX = [
    {"scene": "cover", "spp": 64, "depth": 8},
    {"scene": "cover", "spp": 1000, "depth": 50, "north_star": True},
    {"scene": "textured", "spp": 64, "depth": 8},
    {"scene": "mesh:3", "spp": 64, "depth": 8},
    {"scene": "mesh:5", "spp": 64, "depth": 8},   # 20k-tri asymptote
    {"scene": "meshes:4", "spp": 64, "depth": 8},
    {"scene": "stress:2048", "spp": 64, "depth": 8},
    {"scene": "stress:8192", "spp": 64, "depth": 8},
]


def _run_with_deadline(fn, deadline_s):
    """Run ``fn()`` in a daemon thread. True on completion (the callers
    only need a completed/hung signal, and a fn returning None must not
    look like a hang), None on hang; exceptions propagate."""
    box: dict = {}

    def work():
        try:
            fn()
            box["out"] = True
        except BaseException as e:  # pragma: no cover - surfaced below
            box["err"] = e

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(deadline_s)
    if th.is_alive():
        return None
    if "err" in box:
        raise box["err"]
    return True


def _build(scene_name: str, width: int, spp: int, depth: int):
    """(params, scene) for a named bench scene."""
    import dataclasses

    import raytracing_tpu as rt

    if scene_name.startswith("stress:"):
        n = int(scene_name.split(":", 1)[1])
        cam0, scene = rt.make_world_stress(n, image_width=width)
    elif scene_name == "textured":
        cam0, scene = rt.make_world_textured(image_width=width)
    elif scene_name.startswith("meshes"):
        k = int(scene_name.split(":", 1)[1]) if ":" in scene_name else 4
        cam0, scene = rt.make_world_meshes(k, image_width=width)
    elif scene_name.startswith("mesh"):
        sub = int(scene_name.split(":", 1)[1]) if ":" in scene_name else 3
        cam0, scene = rt.make_world_mesh(image_width=width, subdivisions=sub)
    else:
        world = rt.load_world("data/config/world.config.json")
        params = dataclasses.replace(
            world.camera,
            aspect_ratio=16.0 / 9.0,
            image_width=width,
            samples_per_pixel=spp,
            max_depth=depth,
        )
        _, scene = rt.build_world(dataclasses.replace(world, camera=params))
        return params, scene
    params = dataclasses.replace(
        cam0,
        aspect_ratio=16.0 / 9.0,
        image_width=width,
        samples_per_pixel=spp,
        max_depth=depth,
    )
    return params, scene


def _measure(
    scene_name: str,
    width: int,
    spp: int,
    depth: int,
    seed: int,
    repeats: int,
    warmup_spp: int = 1,
    max_rays_per_batch: int | None = None,
    north_star: bool = False,
) -> dict | None:
    """Best-of-N seed-varied warm measurement of one config; returns the
    result row (None if nothing completed -- tunnel down)."""
    import raytracing_tpu as rt

    params, scene = _build(scene_name, width, spp, depth)
    rkw = {}
    if max_rays_per_batch is not None:
        rkw["max_rays_per_batch"] = max_rays_per_batch
    renderer = rt.Renderer(scene, params, seed=seed, **rkw)
    # Warmup: compile every wave shape once.
    if _run_with_deadline(
        lambda: renderer.render(spp=warmup_spp), _WARMUP_DEADLINE_S
    ) is None:
        return None

    # Best of N seed-varied warm runs (min wall == least tunnel contention;
    # distinct seeds defeat the tunnel's identical-execution dedupe). Timed
    # seeds are offset by +1 so rep 0 can never replay the warmup execution
    # (same seed + same spp when spp == warmup_spp would dedupe into a
    # near-instant, fraudulent best-of winner).
    runs = []
    hung = 0
    for rep in range(max(repeats, 1)):
        # ONE renderer across repeats: reseed() switches the RNG stream
        # (defeating the tunnel's identical-execution dedupe) while
        # keeping the measured wave rate, so repeats 1+ size their first
        # wave from evidence instead of re-paying the 8-spp probe wave
        # (straggler-tail-expensive; see Renderer._wave_rate).
        renderer.reseed(seed + 1 + rep)
        deadline = (
            max(120.0, 10.0 * runs[0][1]) if runs else _FIRST_RUN_DEADLINE_S
        )
        t0 = time.perf_counter()
        done = _run_with_deadline(
            lambda r=renderer: r.render(spp=spp), deadline
        )
        if done is None:
            # A stuck dispatch poisons the runtime for later repeats too --
            # stop here and report whatever completed.
            hung = max(repeats, 1) - rep
            break
        wall = time.perf_counter() - t0
        runs.append((renderer.segments_traced / wall / 1.0e6, wall,
                     renderer.segments_traced))
    if not runs:
        return None
    mrays, wall, segments = max(runs)

    target = 500.0  # Mrays/s/chip north star (BASELINE.json)
    if north_star:
        metric = "north_star_throughput"
    elif scene_name.startswith("stress"):
        metric = "stress_scene_throughput"
    elif scene_name == "textured":
        metric = "textured_scene_throughput"
    elif scene_name.startswith("meshes"):
        metric = "meshes_scene_throughput"
    elif scene_name.startswith("mesh"):
        metric = "mesh_scene_throughput"
    else:
        metric = "cover_scene_throughput"
    return {
        "metric": metric,
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / target, 4),
        "wall_s": round(wall, 3),
        "segments": segments,
        "spread": [round(r[0], 1) for r in runs],
        **({"hung_runs": hung} if hung else {}),
        "scene": scene_name,
        "config": (
            f"{params.image_width}x{params.image_height}@{spp}"
            f"spp depth{depth} {scene.num_objects} spheres"
            + (
                f" {scene.num_triangles} tris"
                if scene.has_triangles
                else ""
            )
        ),
    }


def _run_matrix(args) -> int:
    rows = []
    poisoned = False
    for cfg in _MATRIX:
        ns = cfg.get("north_star", False)
        row = _measure(
            cfg["scene"], args.width, cfg["spp"], cfg["depth"],
            seed=args.seed, repeats=args.repeats,
            warmup_spp=args.warmup_spp,
            max_rays_per_batch=(1 << 24) if ns else args.max_rays_per_batch,
            north_star=ns,
        )
        if row is None:
            row = {
                "metric": "hung", "scene": cfg["scene"],
                "config": f"@{cfg['spp']}spp depth{cfg['depth']}",
            }
        print(json.dumps(row), flush=True)
        rows.append(row)
        if row.get("metric") == "hung" or row.get("hung_runs"):
            # A wedged dispatch poisons the runtime for every later
            # config (same rationale as the single-run path) -- stop
            # measuring, record what completed.
            poisoned = True
            break
    artifact = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "repeats": args.repeats,
        "width": args.width,
        **({"aborted_on_hang": True} if poisoned else {}),
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out} ({len(rows)} rows)", file=sys.stderr)
    if poisoned:
        # Normal interpreter teardown can block on the wedged dispatch
        # (jax atexit hooks) -- same escape hatch as the single-run path.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--warmup-spp", type=int, default=1)
    ap.add_argument(
        "--scene", default="cover",
        help="'cover' (488-sphere reference scene), 'textured' "
        "(BASELINE config 3: checker + image textures, defocus camera), "
        "'mesh[:S]' (BASELINE config 4: icosphere mesh, 20*4^S triangles), "
        "'meshes[:K]' (K separated icosphere instances with occluding "
        "spheres -- exercises whole-object cull/hint skips), "
        "or 'stress:<N>' (procedural N-sphere grid, scaling "
        "characterization)",
    )
    ap.add_argument(
        "--north-star", action="store_true",
        help="measure the BASELINE.json north-star config verbatim: "
        "1920x1080 @ 1000 spp, depth 50 (overrides --spp/--depth/--width)",
    )
    ap.add_argument(
        "--matrix", action="store_true",
        help="run the full BASELINE config matrix (one JSON row per "
        "config) and write the artifact to --out",
    )
    ap.add_argument(
        "--out", default="BENCH_FULL.json",
        help="with --matrix: artifact path",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--repeats", type=int, default=5,
        help="timed warm renders (seed-varied; best one is reported). "
        "Repeats are cheap (wave-rate memory: one renderer, reseed() "
        "keeps the measured rate and compiled executables), and the "
        "tunnel's contention is bursty, so a larger best-of tightens "
        "the uncontended-rate estimate at ~3 s per extra repeat.",
    )
    ap.add_argument(
        "--max-rays-per-batch", type=int, default=None,
        help="Renderer wave-size bound. Larger waves amortize in-kernel "
        "straggler lanes (long-tail path lengths) across more samples -- "
        "north-star mode defaults to 1<<24 so depth-50 chunks carry "
        "hundreds of samples per slot instead of 32.",
    )
    args = ap.parse_args()

    if args.matrix:
        sys.exit(_run_matrix(args))

    if args.north_star:
        args.width, args.spp, args.depth = 1920, 1000, 50
        if args.max_rays_per_batch is None:
            args.max_rays_per_batch = 1 << 24

    row = _measure(
        args.scene, args.width, args.spp, args.depth,
        seed=args.seed, repeats=args.repeats, warmup_spp=args.warmup_spp,
        max_rays_per_batch=args.max_rays_per_batch,
        north_star=args.north_star,
    )
    if row is None:
        print("bench: every run hung past deadline (tunnel down)",
              file=sys.stderr)
        os._exit(1)
    hung = row.get("hung_runs", 0)
    row.pop("scene", None)
    print(json.dumps(row))
    if hung:
        # A worker is still stuck inside the runtime; skip normal teardown
        # (its atexit hooks can block on the wedged dispatch).
        sys.stdout.flush()
        os._exit(0)


if __name__ == "__main__":
    sys.exit(main())

"""HW sanity A/B: (1,1)-mesh sharded render vs the unsharded path.

Verdict round-3 task 1c: with work-ahead regen now threaded through the
sharded megakernel path (parallel/shard.py), bound the shard_map wrapper
overhead on REAL hardware by rendering the bench cover config through a
1-device ``(px=1, spp=1)`` mesh and through the plain unsharded renderer,
order-alternated to cancel tunnel drift. Also records an exactness
receipt: same seed, sharded vs unsharded -> integer-equal segment totals
and byte-identical images (the CPU-mesh tests prove this across real
decompositions; this re-verifies the trivial mesh on the actual TPU).

Exactness contract (mirrors tests/test_renderer.py::
test_work_ahead_multi_wave_matches_single_wave): the SAMPLE SET is
decomposition-invariant, but radiance sums regroup across wave plans
(renderer adds per-wave kernel sums: f32 summation-order roundoff,
absorbed by u8 quantization to |diff| <= 1) and segment totals are
per-tile exact ints summed in f32 (trace.py ``jnp.sum(stats...f32)`` --
~1e-7 relative quantization at the bench's 344M segments). So:
  * matched single-wave plans (spp <= 32 skips the adaptive probe, one
    deterministic wave each) -> segments EQUAL, images BYTE-IDENTICAL;
  * full adaptive renders (plans differ run to run on real hardware) ->
    segments within 1e-5 relative, u8 images within 1.

Run on the tunnel (never alongside pytest):
  PYTHONPATH=/root/.axon_site:. python scripts/hw_shard_overhead.py
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2,
                    help="timed pairs per arm (order-alternated)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    import raytracing_tpu as rt
    from raytracing_tpu.parallel.mesh import make_mesh

    world = rt.load_world("data/config/world.config.json")
    params = dataclasses.replace(
        world.camera,
        aspect_ratio=16.0 / 9.0,
        image_width=args.width,
        samples_per_pixel=args.spp,
        max_depth=args.depth,
    )
    _, scene = rt.build_world(dataclasses.replace(world, camera=params))

    mesh = make_mesh([jax.devices()[0]], sample_axis=1)  # (px=1, spp=1)
    plain = rt.Renderer(scene, params, seed=args.seed)
    shard = rt.Renderer(scene, params, seed=args.seed, mesh=mesh)

    # Exactness receipts first (they double as the compile warmup for
    # both programs). Tier 1: matched single-wave plans (spp=32 skips the
    # adaptive probe -> one deterministic wave each side) must agree
    # EXACTLY: equal segment ints, byte-identical images.
    img_p32 = plain.render(spp=32)
    img_s32 = shard.render(spp=32)
    seg_eq = plain.segments_traced == shard.segments_traced
    img_eq = np.array_equal(img_p32, img_s32)
    print(
        f"matched single-wave: segments {plain.segments_traced} vs "
        f"{shard.segments_traced} ({'EQUAL' if seg_eq else 'DIFFER'}), "
        f"images {'byte-identical' if img_eq else 'DIFFER'}",
        flush=True,
    )
    # Tier 2: full adaptive renders (wave plans are timing-dependent on
    # real hardware, so sums regroup): segments within 1e-5 relative,
    # u8 images within 1 (the documented metrics-grade f32 effects).
    plain.reseed(args.seed)
    shard.reseed(args.seed)
    img_p = plain.render(spp=args.spp)
    img_s = shard.render(spp=args.spp)
    seg_p, seg_s = plain.segments_traced, shard.segments_traced
    rel = abs(seg_p - seg_s) / max(seg_p, 1)
    maxd = int(np.abs(img_p.astype(int) - img_s.astype(int)).max())
    ndiff = int((img_p != img_s).any(axis=-1).sum())
    tol_ok = rel <= 1e-5 and maxd <= 1
    print(
        f"adaptive: segments {seg_p} vs {seg_s} (rel {rel:.2e}), "
        f"u8 max|diff| {maxd} over {ndiff} px "
        f"({'within documented tolerance' if tol_ok else 'OUT OF TOLERANCE'})",
        flush=True,
    )
    exact = bool(seg_eq and img_eq and tol_ok)

    def timed(r, seed):
        r.reseed(seed)
        t0 = time.perf_counter()
        r.render(spp=args.spp)
        wall = time.perf_counter() - t0
        return r.segments_traced / wall / 1e6, wall

    runs = {"plain": [], "sharded": []}
    # Order-alternated: p s | s p | p s | s p ... cancels tunnel drift.
    seed = args.seed
    for rep in range(max(args.repeats, 1)):
        order = (
            [("plain", plain), ("sharded", shard)]
            if rep % 2 == 0
            else [("sharded", shard), ("plain", plain)]
        )
        for name, r in order:
            seed += 1
            mrays, wall = timed(r, seed)
            runs[name].append(round(mrays, 2))
            print(f"{name}: {mrays:.2f} Mrays/s ({wall:.2f} s)", flush=True)

    best_p, best_s = max(runs["plain"]), max(runs["sharded"])
    print(
        json.dumps(
            {
                "metric": "shard_1x1_overhead",
                "plain_best": best_p,
                "sharded_best": best_s,
                "overhead_pct": round(100.0 * (1.0 - best_s / best_p), 2),
                "plain_runs": runs["plain"],
                "sharded_runs": runs["sharded"],
                "exact": exact,
                "config": f"{args.width}x{params.image_height}@{args.spp}"
                          f" d{args.depth} mesh(1,1)",
            }
        ),
        flush=True,
    )
    return 0 if exact else 1


if __name__ == "__main__":
    sys.exit(main())

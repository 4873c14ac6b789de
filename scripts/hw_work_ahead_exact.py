"""Hardware exactness spot-check for work-ahead regen (RT_WORK_AHEAD).

The CPU/interpret test suite proves multi-wave work-ahead draws the
identical sample set as self-contained waves (segments EQUAL as integers;
image sums equal to f32 roundoff, u8 within 1). Round-2 lesson (the MXU
subnormal/NaN corruption was CPU-invisible): every new default kernel path
also gets a real-TPU check, because XLA-on-TPU canonicalization and Mosaic
compilation can diverge from interpret mode in ways CPU never shows.

Renders one multi-wave cover-scene workload (fresh renderer => 8-spp probe
wave + adaptive waves, so the work-ahead path is genuinely exercised) with
RT_WORK_AHEAD=1 and =0 in one process (clear_caches between variants; the
knob is read at trace time) and asserts:
  - segments_traced EXACTLY equal (integer invariant: the identical sample
    set is traced; open-path partial depths are subtracted per wave),
  - u8 images within 1 (f32 association differs across wave groupings).

Usage (real TPU):
  PYTHONPATH=/root/.axon_site:. python scripts/hw_work_ahead_exact.py
"""

from __future__ import annotations

import dataclasses
import os
import time


def main() -> int:
    import numpy as np

    import jax

    import raytracing_tpu as rt

    width, spp, depth = 320, 64, 8
    world = rt.load_world("data/config/world.config.json")
    params = dataclasses.replace(
        world.camera,
        aspect_ratio=16.0 / 9.0,
        image_width=width,
        samples_per_pixel=spp,
        max_depth=depth,
    )
    _, scene = rt.build_world(dataclasses.replace(world, camera=params))

    results = {}
    for name, val in (("wa", "1"), ("off", "0")):
        os.environ["RT_WORK_AHEAD"] = val
        jax.clear_caches()
        r = rt.Renderer(scene, params, seed=7)
        t0 = time.perf_counter()
        img = r.render()
        wall = time.perf_counter() - t0
        results[name] = (np.asarray(img), r.segments_traced)
        print(
            f"{name}: segments={r.segments_traced} wall={wall:.2f}s "
            f"img_sha_prefix={hash(img.tobytes()) & 0xffffffff:08x}"
        )
    os.environ.pop("RT_WORK_AHEAD", None)

    img_a, seg_a = results["wa"]
    img_b, seg_b = results["off"]
    assert seg_a == seg_b, f"segment totals diverge: {seg_a} vs {seg_b}"
    max_diff = int(
        np.max(np.abs(img_a.astype(np.int16) - img_b.astype(np.int16)))
    )
    print(f"segments equal; max u8 diff = {max_diff}")
    assert max_diff <= 1, f"u8 images differ by {max_diff} > 1"
    print("OK: work-ahead is exact on hardware")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

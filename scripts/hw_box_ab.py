"""Hardware A/B for the AABB cull gate (RT_CULL=box): bit-exactness + time.

Renders each scene with RT_CULL in the requested kinds IN ONE PROCESS
(jax.clear_caches() between kinds; the knob is read at trace time) and
prints the image sha256 + wall time per kind. Hashes must MATCH across
kinds (the cull is bit-transparent); times give a coarse A/B (use bench.py
best-of-3 for the real numbers).

Round-2 lesson motivating this script: interpret-mode equality does NOT
rule out hardware-only divergence (the MXU subnormal/NaN f32 corruption was
invisible on CPU) -- every new gate variant gets a hardware hash check
before becoming a default.

Usage (real TPU):
  PYTHONPATH=/root/.axon_site:. python scripts/hw_box_ab.py \
      --scenes stress:2048,mesh:3 --kinds 0,sphere,box [--spp 16]
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import os
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="stress:2048,mesh:3")
    ap.add_argument("--kinds", default="0,sphere,box")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=8)
    args = ap.parse_args()

    import numpy as np

    import raytracing_tpu as rt

    def build(name):
        if name.startswith("stress:"):
            cam0, scene = rt.make_world_stress(
                int(name.split(":", 1)[1]), image_width=args.width
            )
        elif name.startswith("mesh"):
            sub = int(name.split(":", 1)[1]) if ":" in name else 3
            cam0, scene = rt.make_world_mesh(
                image_width=args.width, subdivisions=sub
            )
        else:
            raise SystemExit(f"unknown scene {name}")
        params = dataclasses.replace(
            cam0,
            aspect_ratio=16.0 / 9.0,
            image_width=args.width,
            samples_per_pixel=args.spp,
            max_depth=args.depth,
        )
        return scene, params

    import jax

    ok = True
    for name in args.scenes.split(","):
        scene, params = build(name)
        hashes = {}
        for kind in args.kinds.split(","):
            os.environ["RT_CULL"] = kind
            jax.clear_caches()
            r = rt.Renderer(scene, params, seed=1, backend="pallas")
            r.render(spp=1)  # compile + warm
            t0 = time.perf_counter()
            img = np.asarray(r.render())
            dt = time.perf_counter() - t0
            h = hashlib.sha256(img.tobytes()).hexdigest()[:16]
            hashes[kind] = h
            print(f"{name} RT_CULL={kind}: {h}  {dt:.2f}s", flush=True)
        if len(set(hashes.values())) != 1:
            ok = False
            print(f"{name}: HASH MISMATCH {hashes}", flush=True)
    print("ALL MATCH" if ok else "DIVERGENCE", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

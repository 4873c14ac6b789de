"""Hardware bit-exactness hash across kernel PATH variants (env knobs).

Generalizes scripts/hw_box_ab.py: renders each scene once per env-variant
IN ONE PROCESS (jax.clear_caches() between variants; the knobs are read at
trace time) and compares image sha256 across variants -- they must MATCH
for bit-transparent knobs (MXU vs radix gather, MXU vs fori window
collapse, cull on/off). Round-2 lesson: interpret-mode equality does NOT
rule out hardware-only divergence (the MXU subnormal/NaN corruption was
CPU-invisible), so every new default path gets this check on real TPU.

Usage (real TPU):
  PYTHONPATH=/root/.axon_site:. python scripts/hw_hash_paths.py \
      --scenes mesh:3,mesh:4 \
      --variants "default=;radix=RT_GATHER=radix,RT_TWO_LEVEL_MXU=0" \
      [--width 640 --spp 4]
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import os
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="mesh:3,mesh:4")
    ap.add_argument(
        "--variants",
        default="default=;radix=RT_GATHER=radix,RT_TWO_LEVEL_MXU=0",
        help="semicolon list of NAME=K1=V1,K2=V2 env bundles",
    )
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--spp", type=int, default=4)
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
        elif name == "cover":
            cam0, scene = rt.make_world_spheres(image_width=args.width)
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

    variants = []
    for spec in args.variants.split(";"):
        name, _, envs = spec.partition("=")
        bundle = {}
        if envs:
            for kv in envs.split(","):
                k, _, v = kv.partition("=")
                bundle[k] = v
        variants.append((name, bundle))
    touched = sorted({k for _, b in variants for k in b})

    import jax

    ok = True
    for sname in args.scenes.split(","):
        scene, params = build(sname)
        hashes = {}
        for vname, bundle in variants:
            for k in touched:
                os.environ.pop(k, None)
            os.environ.update(bundle)
            jax.clear_caches()
            r = rt.Renderer(scene, params, seed=1, backend="pallas")
            r.render(spp=1)  # compile + warm
            t0 = time.perf_counter()
            img = np.asarray(r.render())
            dt = time.perf_counter() - t0
            h = hashlib.sha256(img.tobytes()).hexdigest()[:16]
            hashes[vname] = h
            print(f"{sname} {vname}: {h}  {dt:.2f}s", flush=True)
        if len(set(hashes.values())) != 1:
            ok = False
            print(f"{sname}: HASH MISMATCH {hashes}", flush=True)
    print("ALL MATCH" if ok else "DIVERGENCE", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

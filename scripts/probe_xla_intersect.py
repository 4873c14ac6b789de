"""Decompose the XLA wavefront backend's TPU cost (VERDICT round-1 weak #3).

intersect_scene at B=0.5M rays x N=488 spheres measured ~110 ms on TPU --
~45x over any reasonable bound. Suspects: (a) XLA materializing the (B, N)
elementwise chain to HBM instead of fusing into the min-reduce (15+ f32
(B, N) buffers = ~1 GB each of HBM traffic), (b) the HIGHEST-precision K=6
matmul, (c) the argmin+min pair (already disproven in round 1).

Experiments (all jitted, warm, best of 5):
  full       -- intersect_scene as the integrator calls it
  dots_only  -- just the (B,6)@(6,2N) HIGHEST matmul
  epilogue   -- elementwise+reduce chain with dots precomputed OUTSIDE
  chunked    -- lax.map over 16K-ray chunks (bounds live (B,N) tiles)
  bcast      -- use_matmul=False (einsum dots)

Usage: python scripts/probe_xla_intersect.py [--rays 524288]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from raytracing_tpu.ops import intersect as ri
from raytracing_tpu.scene.config import load_world, build_world


def timed(fn, *args, reps=5, inner=3):
    fn(*args)[0].block_until_ready()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            r = fn(*args)
        jax.tree.leaves(r)[0].block_until_ready()
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=524288)
    args = ap.parse_args()
    world = load_world("data/config/world.config.json")
    _, scene = build_world(world)
    n = scene.num_objects
    b = args.rays
    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (b, 3), jnp.float32) * 3.0
    d = jax.random.normal(jax.random.PRNGKey(1), (b, 3), jnp.float32)
    print(f"B={b} rays, N={n} spheres, platform={jax.devices()[0].platform}")

    full = jax.jit(functools.partial(ri.intersect_scene, scene=scene))
    t = timed(full, o, d)
    print(f"  full       : {t*1e3:8.2f} ms  ({b/t/1e6:7.1f} Mray/s)")

    bcast = jax.jit(
        functools.partial(ri.intersect_scene, scene=scene, use_matmul=False)
    )
    t = timed(bcast, o, d)
    print(f"  bcast dots : {t*1e3:8.2f} ms  ({b/t/1e6:7.1f} Mray/s)")

    dots = jax.jit(
        lambda o, d: ri._dots_matmul(o, d, scene.centers)
    )
    t = timed(dots, o, d)
    print(f"  dots_only  : {t*1e3:8.2f} ms")

    @jax.jit
    def epilogue(o, d, d_dot_c, o_dot_c):
        a = jnp.sum(d * d, axis=-1, keepdims=True)
        d_dot_o = jnp.sum(d * o, axis=-1, keepdims=True)
        o_dot_o = jnp.sum(o * o, axis=-1, keepdims=True)
        c_dot_c = jnp.sum(scene.centers * scene.centers, axis=-1)
        h = d_dot_c - d_dot_o
        c = (
            c_dot_c[None, :] - 2.0 * o_dot_c + o_dot_o
            - scene.radii[None, :] ** 2
        )
        delta = h * h - a * c
        sqrtd = jnp.sqrt(jnp.maximum(delta, 0.0))
        inv_a = 1.0 / a
        root_near = (h - sqrtd) * inv_a
        root_far = (h + sqrtd) * inv_a
        ok = lambda t: (t > 1e-4) & (t < jnp.inf)  # noqa: E731
        near_ok = ok(root_near)
        root = jnp.where(near_ok, root_near, root_far)
        valid = (delta >= 0.0) & (near_ok | ok(root_far))
        cand = jnp.where(valid, root, jnp.inf)
        return jnp.min(cand, axis=-1), jnp.argmin(cand, axis=-1)

    dc, oc = dots(o, d)
    dc.block_until_ready()
    t = timed(epilogue, o, d, dc, oc)
    print(f"  epilogue   : {t*1e3:8.2f} ms")

    chunk = 16384

    @jax.jit
    def chunked(o, d):
        os = o.reshape(b // chunk, chunk, 3)
        ds = d.reshape(b // chunk, chunk, 3)
        return jax.lax.map(
            lambda od: ri.intersect_scene(od[0], od[1], scene), (os, ds)
        )

    t = timed(chunked, o, d)
    print(f"  chunked16K : {t*1e3:8.2f} ms  ({b/t/1e6:7.1f} Mray/s)")


if __name__ == "__main__":
    main()

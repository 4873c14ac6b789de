"""Decompose the XLA wavefront backend's TPU cost (VERDICT round-2 weak #3).

The wavefront integrator measures ~2.6 Mrays/s on a v5e (intersect_scene
~110 ms per 0.5M rays at N=512) -- ~45x over a naive flop bound. Round 2
eliminated the argmin+min pair (packed-key single reduce changed nothing).
This probe times each pipeline piece in isolation on hardware so the gap
can be attributed instead of suspected:

  full       intersect_scene as the integrator calls it
  dots_hi    the two HIGHEST-precision (B,3)x(N,3) einsums alone
  dots_def   the same einsums at default precision
  dots_bcast the _dots_broadcast formulation (no MXU)
  elem       the elementwise quadratic + select chain, dots precomputed
  reduce     argmin+min over a precomputed (B, N) candidate tile
  ew_bn      a single fused multiply-add over (B, N) -- HBM roofline anchor

Each measurement: jit, one warm call, then best of 3 timed calls with a
seed-varied input (the axon tunnel dedupes identical executions). Run on
an otherwise-idle chip; tunnel noise is 2x over hours.

Usage: python scripts/probe_xla_wavefront.py [B] [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu.ops import intersect as rintersect
from raytracing_tpu.scene.types import SceneBuilder


def bench(fn, *args, reps=3):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.tree.map(lambda x: np.asarray(x), out)  # force completion
    best = float("inf")
    for r in range(reps):
        # Vary one input so the tunnel cannot serve a cached execution.
        args_r = (args[0] + jnp.float32(1e-6 * (r + 1)),) + args[1:]
        t0 = time.perf_counter()
        out = fn_j(*args_r)
        jax.tree.map(lambda x: np.asarray(x), out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 19
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 488

    rng = np.random.default_rng(0)
    sb = SceneBuilder()
    for _ in range(n):
        sb.add_lambertian_sphere(
            tuple(rng.uniform(-8, 8, 3)), rng.uniform(0.2, 0.9),
            (0.5, 0.5, 0.5),
        )
    scene = sb.build()

    o = jnp.asarray(rng.normal(size=(b, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(b, 3)), jnp.float32)
    centers = scene.centers
    radii = scene.radii

    t_full = bench(
        lambda oo, dd: rintersect.intersect_scene(oo, dd, scene), o, d
    )

    hi = jax.lax.Precision.HIGHEST

    def dots_hi(oo, dd):
        return (
            jnp.einsum("bk,nk->bn", dd, centers, precision=hi),
            jnp.einsum("bk,nk->bn", oo, centers, precision=hi),
        )

    def dots_def(oo, dd):
        return (
            jnp.einsum("bk,nk->bn", dd, centers),
            jnp.einsum("bk,nk->bn", oo, centers),
        )

    def dots_bcast(oo, dd):
        return (
            jnp.sum(dd[:, None, :] * centers[None, :, :], axis=-1),
            jnp.sum(oo[:, None, :] * centers[None, :, :], axis=-1),
        )

    t_dots_hi = bench(dots_hi, o, d)
    t_dots_def = bench(dots_def, o, d)
    t_dots_bcast = bench(dots_bcast, o, d)

    ddc, odc = jax.jit(dots_hi)(o, d)
    ddc = jnp.asarray(ddc)
    odc = jnp.asarray(odc)

    def elem(ddc_, odc_, oo, dd):
        a = jnp.sum(dd * dd, axis=-1, keepdims=True)
        d_dot_o = jnp.sum(dd * oo, axis=-1, keepdims=True)
        o_dot_o = jnp.sum(oo * oo, axis=-1, keepdims=True)
        c_dot_c = jnp.sum(centers * centers, axis=-1)
        h = ddc_ - d_dot_o
        c = c_dot_c[None, :] - 2.0 * odc_ + o_dot_o - radii[None, :] ** 2
        delta = h * h - a * c
        sqrtd = jnp.sqrt(jnp.maximum(delta, 0.0))
        inv_a = 1.0 / a
        root_near = (h - sqrtd) * inv_a
        root_far = (h + sqrtd) * inv_a
        near_ok = (root_near > 1e-4) & (root_near < 3e38)
        far_ok = (root_far > 1e-4) & (root_far < 3e38)
        root = jnp.where(near_ok, root_near, root_far)
        valid = (delta >= 0.0) & (near_ok | far_ok)
        cand = jnp.where(valid, root, jnp.float32(np.inf))
        return jnp.argmin(cand, axis=-1), jnp.min(cand, axis=-1)

    t_elem = bench(elem, ddc, odc, o, d)

    cand = jnp.abs(ddc) + 1.0
    t_reduce = bench(
        lambda c_: (jnp.argmin(c_, axis=-1), jnp.min(c_, axis=-1)), cand
    )
    t_ew = bench(lambda c_: c_ * 1.0001 + 0.5, cand)

    gb = b * n * 4 / 1e9
    print(f"B={b} N={n}  ((B,N) f32 = {gb:.2f} GB)")
    for name, t in [
        ("full intersect_scene", t_full),
        ("dots HIGHEST", t_dots_hi),
        ("dots default", t_dots_def),
        ("dots broadcast", t_dots_bcast),
        ("elementwise+reduce (dots given)", t_elem),
        ("argmin+min only", t_reduce),
        ("one ew op on (B,N)", t_ew),
    ]:
        print(f"  {name:34s} {t * 1e3:9.2f} ms  "
              f"({gb / max(t, 1e-9):6.1f} GB/s per (B,N) pass)")


if __name__ == "__main__":
    main()

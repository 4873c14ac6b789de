"""Decompose the XLA wavefront backend's TPU cost (VERDICT round-2 weak #3).

The wavefront integrator measures ~2.6 Mrays/s on a v5e (intersect_scene
~110 ms per 0.5M rays at N=488) -- ~45x over a naive flop bound. Round 2
eliminated the argmin+min pair (packed-key single reduce changed nothing).
This probe times each pipeline piece in isolation on hardware so the gap
can be attributed instead of suspected:

  noop       fetch a precomputed (B,) array -- tunnel dispatch+fetch floor
  full       intersect_scene as the integrator calls it
  dots_hi    the two HIGHEST-precision (B,3)x(N,3) einsums (max-reduced
             to (B,) on device so the tunnel fetch stays small)
  dots_def   the same einsums at default precision
  elem       the elementwise quadratic + select + argmin/min chain with
             the dots precomputed as inputs
  reduce     argmin+min over a precomputed (B, N) candidate tile
  ew_read    one multiply-add + row-max over (B, N) -- a single HBM read
             pass (roofline anchor)

Every piece returns (B,)-sized device results (the real integrator keeps
(B, N) intermediates on device too), so tunnel transfer is constant
across rows. Timing: jit, one warm call, then best of `reps` with a
seed-varied input (the axon tunnel dedupes identical executions). Run on
an otherwise-idle chip; tunnel noise is 2x over hours.

RESULT (round 3, v5e via axon): the mystery is closed. With scalar-
reduced outputs and the ~30-100 ms dispatch+fetch floor subtracted,
intersect_scene device compute is 13.3 ms per 0.5M rays at N=488 -- AT
its roofline (two materialized 1 GB einsum outputs at the separately
measured 800+ GB/s HBM stream rate, plus ~5 G fused VPU lane-ops). The
historical "~110 ms / 45x over flop bound" timed three sequential (B,)
fetches and the dispatch floor as if they were compute. Full wavefront
depth-8 measures 6.3 Mrays/s; the remaining gap vs the megakernel is
dead-lane waste in full-width while_loop iterations (4.2M slots worked
for 1.95M useful segments), i.e. the cost in-kernel path regeneration
exists to remove. See CLAUDE.md "Known weak spots".

CAVEAT for (B, N)-input pieces (elem/reduce/ew_read): the seed-varying
`args[0] + eps` is an EAGER 1 GB add inside the timed region (an extra
dispatch + a read/write pass), so those rows overstate their true cost;
the clean rows are noop/full/dots. Kept as-is since the conclusion rests
on the clean rows plus the separate streaming-bandwidth check.

Usage: python scripts/probe_xla_wavefront.py [B] [N] [reps]
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
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

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

    t_noop = bench(lambda oo: oo[:, 0], o, reps=reps)

    t_full = bench(
        lambda oo, dd: rintersect.intersect_scene(oo, dd, scene),
        o, d, reps=reps,
    )

    hi = jax.lax.Precision.HIGHEST

    def dots(oo, dd, prec):
        ddc = jnp.einsum("bk,nk->bn", dd, centers, precision=prec)
        odc = jnp.einsum("bk,nk->bn", oo, centers, precision=prec)
        return jnp.max(ddc, axis=-1), jnp.max(odc, axis=-1)

    t_dots_hi = bench(lambda oo, dd: dots(oo, dd, hi), o, d, reps=reps)
    t_dots_def = bench(lambda oo, dd: dots(oo, dd, None), o, d, reps=reps)

    ddc = jnp.einsum("bk,nk->bn", d, centers, precision=hi)
    odc = jnp.einsum("bk,nk->bn", o, centers, precision=hi)

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

    t_elem = bench(elem, ddc, odc, o, d, reps=reps)

    cand = jnp.abs(ddc) + 1.0
    t_reduce = bench(
        lambda c_: (jnp.argmin(c_, axis=-1), jnp.min(c_, axis=-1)),
        cand, reps=reps,
    )
    t_ew = bench(
        lambda c_: jnp.max(c_ * 1.0001 + 0.5, axis=-1), cand, reps=reps
    )

    gb = b * n * 4 / 1e9
    print(f"B={b} N={n}  ((B,N) f32 = {gb:.2f} GB)  "
          f"dispatch+fetch floor {t_noop * 1e3:.1f} ms")
    for name, t in [
        ("full intersect_scene", t_full),
        ("dots HIGHEST (+row max)", t_dots_hi),
        ("dots default (+row max)", t_dots_def),
        ("elementwise+reduce (dots given)", t_elem),
        ("argmin+min only", t_reduce),
        ("one ew read pass + row max", t_ew),
    ]:
        adj = max(t - t_noop, 1e-9)
        print(f"  {name:34s} {t * 1e3:9.2f} ms  "
              f"(net {adj * 1e3:8.2f} ms, {gb / adj:6.1f} GB/s per "
              f"(B,N) pass)")


if __name__ == "__main__":
    main()

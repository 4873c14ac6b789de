"""Wavefront path-tracing integrator: ``lax.while_loop`` over bounce depth.

This is the TPU-native re-design of the reference's recursive radiance
function ``RayTracingCore::compute_color``
(``/root/reference/src/ray.tracer.core.cc:236-257``) and per-pixel sample loop
``raytrace_pixel`` (``core.cc:259-265``). The recursion

    depth == 0           -> black                     (core.cc:238-240)
    hit && scatter       -> attenuation * recurse     (core.cc:246-249)
    hit && absorbed      -> black                     (core.cc:251)
    miss                 -> vertical-gradient sky     (core.cc:254-256)

becomes an iterative wavefront over a flat ray batch: every live ray carries a
``throughput`` (the product of attenuations so far) and adds
``throughput * sky`` to its radiance at the bounce where it escapes. Rays that
are absorbed, or that survive ``max_depth`` scatters without escaping,
contribute exactly zero -- matching the recursion's base cases under masking
(SURVEY.md section 7 "Hard parts" item 1).

A ``lax.while_loop`` (not ``scan``) is used so the whole batch stops as soon
as every ray is dead: with the shipped depth-8 config most rays terminate in
2-3 bounces, and with depth 50 the early-exit saves ~an order of magnitude of
work over a fixed-trip scan.

RNG: every draw derives from the per-ray key folded with the bounce index, so
radiance is a pure function of (seed, global ray id) -- independent of batch
chunking, sharding, or device count.

Performance policy: this backend is the PORTABLE path (CPU tests, oracle
comparisons, sharding semantics). On TPU it runs AT its XLA roofline
(round-3 profiling, ``scripts/probe_xla_wavefront.py``: intersect_scene
device compute 13.3 ms per 0.5M rays at N=488 = the two materialized
(B, N) einsums + one fused VPU quadratic pass; the round-1 "45x over flop
bound" was tunnel dispatch/fetch overhead misattributed to compute). Its
remaining ~15x gap vs the pallas megakernel is STRUCTURAL: every
``while_loop`` iteration processes the full batch width even though most
rays are dead (4.2M slots worked for 1.95M useful segments at depth 8),
which is precisely the cost the megakernel's in-kernel path regeneration
removes. ``Renderer(backend="auto")`` therefore selects pallas on
tpu/axon platforms; there is nothing left to optimize here short of
rebuilding the megakernel's compaction, which already exists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import camera as rcamera
from ..core import math as rmath
from ..core import rng as rrng
from ..ops import intersect as rintersect
from ..ops import scatter as rscatter
from ..ops import texture as rtexture
from ..scene.types import Scene

# Sky gradient endpoints (core.cc:254-256).
SKY_WHITE = (1.0, 1.0, 1.0)
SKY_BLUE = (0.5, 0.7, 1.0)

# Tag mixed into per-ray keys together with the bounce index, keeping bounce
# streams disjoint from the camera streams (rng.STREAM_CAM_*).
_BOUNCE_TAG = 0x10000

# Scattered rays restart from p + eps * n_oriented instead of exactly p.
# DOCUMENTED DEVIATION from the reference (which restarts at the hit point and
# relies on t_min=1e-4, core.cc:243 + material.defs.cc:40): in float32 the
# quadratic for large spheres (the radius-1000 ground, |oc|^2 ~ 1e6) has
# absolute error well above 1e-4 in t, producing shadow acne -- extra
# self-hits that darken contact regions. The reference's own float32 math has
# the same artifact; the RTiOW *intent* is acne-free, so we follow intent
# (SURVEY.md section 7 "Hard parts" item 6 policy) and nudge the origin along
# the normal, signed toward the new ray's hemisphere so dielectric refraction
# still correctly hits the same sphere's far side. 1e-3 is radiometrically
# negligible at scene scale (~unit-radius spheres).
SELF_HIT_OFFSET = 1.0e-3

# Use the BVH over brute-force triangle intersection above this leaf count
# (tiny meshes are cheaper as one fused min-reduction).
TRI_BVH_MIN_LEAVES = 8


def sky_color(directions: jnp.ndarray) -> jnp.ndarray:
    """Vertical-gradient background (``core.cc:254-256``)."""
    unit = rmath.normalize(directions, eps=1.0e-20)
    t = 0.5 * (unit[..., 1] + 1.0)
    white = jnp.asarray(SKY_WHITE, jnp.float32)
    blue = jnp.asarray(SKY_BLUE, jnp.float32)
    return rmath.lerp(white, blue, t[..., None])


def trace_rays(
    scene: Scene,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    keys: jax.Array,
    max_depth: int,
    *,
    use_matmul: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Trace a batch of rays to completion.

    Args:
      scene: SoA sphere world.
      origins, directions: ``(B, 3)`` float32 camera rays.
      keys: ``(B,)`` per-ray RNG keys (see ``core.rng.ray_keys``).
      max_depth: maximum number of scatters (``rts_maxdepth``,
        ``core.cc:205``); a ray still alive after ``max_depth`` bounces
        contributes 0 (``core.cc:238-240``).

    Returns:
      ``(radiance, segments)``: per-ray linear RGB radiance ``(B, 3)`` and the
      scalar int32 count of ray segments actually traced (the honest
      denominator for Mrays/s -- rays * E[path length], SURVEY.md section 3.3).
    """
    b = origins.shape[0]
    if scene.num_objects == 0 and not scene.has_triangles:
        # Static empty world: every ray escapes to the sky on its first
        # bounce (or contributes black when max_depth == 0, core.cc:238-240).
        if max_depth <= 0:
            return jnp.zeros((b, 3), jnp.float32), jnp.int32(0)
        return sky_color(directions), jnp.int32(b)

    # Loop-carry inits are derived arithmetically from the (finite) ray inputs
    # rather than fresh constants so their device-varying type matches the
    # loop outputs under shard_map's varying-manual-axes check.
    zero3 = origins * 0.0
    init = (
        origins,
        directions,
        zero3 + 1.0,                                  # throughput = 1
        zero3,                                        # radiance = 0
        zero3[:, 0] == 0.0,                           # alive = True
        jnp.int32(0),                                 # bounce index
        jnp.sum(zero3[:, 0]).astype(jnp.int32),       # segments traced = 0
    )

    def cond(state):
        _, _, _, _, alive, bounce, _ = state
        return (bounce < max_depth) & jnp.any(alive)

    def body(state):
        o, d, tp, rad, alive, bounce, segments = state

        t, idx, hitm = rintersect.intersect_scene(o, d, scene, use_matmul=use_matmul)
        if scene.num_objects == 0:
            idx = jnp.zeros_like(idx)  # no sphere rows to gather; keep shapes
        if scene.has_triangles:
            # Closest hit over BOTH primitive families: the min of the two
            # independent closest hits (each family already reduced over
            # its own table) equals the reference's single linear scan.
            tri_fn = (
                rintersect.intersect_triangles_bvh
                if scene.num_triangles > 2 * TRI_BVH_MIN_LEAVES
                else rintersect.intersect_triangles
            )
            tt, tidx, thit = tri_fn(o, d, scene)
            pick_tri = thit & (tt < t)  # sphere t is inf on miss
            hitm = hitm | thit
        hit = alive & hitm
        miss = alive & ~hitm

        # Escaped rays collect the sky exactly once, at this bounce.
        rad = rad + jnp.where(miss[..., None], tp * sky_color(d), 0.0)

        if scene.num_objects > 0:
            p, normal, front = rintersect.hit_records(o, d, t, idx, scene)
            kind = scene.mat_kind[idx]
            if scene.has_textures:
                outward = jnp.where(front[..., None], normal, -normal)
                albedo = rtexture.surface_albedo(scene, idx, p, outward)
            else:
                albedo = scene.albedo[idx]
            fuzz = scene.fuzz[idx]
            ior = scene.ior[idx]
        else:
            # Triangle-only scene: placeholder sphere records (every lane
            # that hits picks the triangle branch below).
            p = jnp.zeros_like(o)
            normal = jnp.zeros_like(o).at[:, 1].set(1.0)
            front = jnp.ones((o.shape[0],), bool)
            kind = jnp.zeros((o.shape[0],), jnp.int32)
            albedo = jnp.ones_like(o)
            fuzz = jnp.zeros((o.shape[0],), jnp.float32)
            ior = jnp.ones((o.shape[0],), jnp.float32)
        if scene.has_triangles:
            p_t, n_t, f_t = rintersect.triangle_hit_records(
                o, d, tt, tidx, scene
            )
            pt3 = pick_tri[..., None]
            p = jnp.where(pt3, p_t, p)
            normal = jnp.where(pt3, n_t, normal)
            front = jnp.where(pick_tri, f_t, front)
            kind = jnp.where(pick_tri, scene.tri_mat_kind[tidx], kind)
            albedo = jnp.where(pt3, scene.tri_albedo[tidx], albedo)
            fuzz = jnp.where(pick_tri, scene.tri_fuzz[tidx], fuzz)
            ior = jnp.where(pick_tri, scene.tri_ior[tidx], ior)

        bounce_keys = rrng.fold(keys, _BOUNCE_TAG + bounce)
        unit_vec = rrng.unit_vector(rrng.fold(bounce_keys, rrng.STREAM_UNIT_VEC))
        urand = rrng.uniform(rrng.fold(bounce_keys, rrng.STREAM_SCHLICK))

        new_dir, atten, scat_ok = rscatter.scatter(
            d, normal, front, kind, albedo, fuzz, ior, unit_vec, urand
        )

        survives = hit & scat_ok
        side = jnp.sign(rmath.dot(new_dir, normal))[..., None]
        p_safe = p + SELF_HIT_OFFSET * side * normal
        tp = jnp.where(survives[..., None], tp * atten, tp)
        o = jnp.where(survives[..., None], p_safe, o)
        d = jnp.where(survives[..., None], new_dir, d)

        segments = segments + jnp.sum(alive.astype(jnp.int32))
        return (o, d, tp, rad, survives, bounce + 1, segments)

    _, _, _, radiance, _, _, segments = jax.lax.while_loop(cond, body, init)
    return radiance, segments


def render_pixels(
    scene: Scene,
    cam: rcamera.DerivedCamera,
    base_key: jax.Array,
    pixel_ids: jnp.ndarray,
    sample_start: jnp.ndarray,
    chunk_samples: int,
    spp: int,
    max_depth: int,
    *,
    sample_limit: jnp.ndarray | None = None,
    use_matmul: bool = True,
    backend: str = "xla",
    pallas_seed: jnp.ndarray | None = None,
    pixel_order: str = "linear",
    slot_base: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Trace ``chunk_samples`` samples for each pixel in ``pixel_ids``.

    Pure function (jit-friendly; ``chunk_samples``/``spp``/``max_depth``
    static). Both backends key their RNG by (pixel, absolute sample id), so
    the result is invariant to chunking and sharding.

    Args:
      sample_limit: optional traced exclusive upper bound on sample ids;
        samples at/above it contribute zero radiance (used by the sharded
        path when a chunk doesn't divide evenly across the sample axis --
        shapes stay static, the tail is masked).
      backend: "xla" (wavefront while_loop, any platform) or "pallas" (fused
        TPU megakernel; requires the ray count P*chunk_samples to be a
        multiple of the kernel tile). Camera-ray sampling is identical for
        both; the pallas RNG is a counter-based hash keyed by
        (pallas_seed, slot, sample, bounce), so its noise differs from the
        XLA path's threefry streams (statistically equivalent).
      pallas_seed: int32 scalar, required for backend="pallas".

    Returns ``(radiance_sum[P, 3], segments)``.
    """
    p = pixel_ids.shape[0]

    if backend == "pallas":
        # Fully fused wave: camera sampling + path tracing + in-kernel sample
        # regeneration. Each work slot owns ONE pixel and traces all
        # ``chunk_samples`` of its samples back-to-back; the kernel returns
        # per-pixel radiance sums directly. The slot -> pixel map is
        # "linear" (pid = slot; pixel_ids must be the contiguous range
        # starting at pixel_ids[0]) or "tiled" (32x32 pixel tiles matching
        # runtime/tiling.tiled_pixel_ids; pixel_ids must be that table's
        # slice starting at slot_base). Padded/out-of-image slots spill past
        # the image and are discarded by the caller's scatter-add.
        from ..ops.pallas import trace as ptrace
        from ..runtime import tiling as rtiling

        if sample_limit is not None:
            raise NotImplementedError(
                "sample_limit tail masking is an xla-backend feature (the "
                "regen kernel takes its budget as a runtime scalar instead)"
            )
        if pixel_order == "tiled":
            map_param = rtiling.tiles_per_row(cam.image_width)
            base = slot_base if slot_base is not None else jnp.int32(0)
        else:
            map_param = cam.image_width
            base = pixel_ids[0]

        radiance_sum, segments = ptrace.render_pixels_fused(
            scene,
            cam.pixel00,
            cam.pixel_delta_u,
            cam.pixel_delta_v,
            cam.center,
            cam.defocus_disk_u,
            cam.defocus_disk_v,
            cam.defocus_angle,
            map_param,
            base,
            pallas_seed if pallas_seed is not None else jnp.int32(0),
            jnp.asarray(sample_start, jnp.int32),
            p,
            chunk_samples,
            max_depth,
            pixel_order=pixel_order,
        )
        return radiance_sum, segments
    else:
        sample_ids = sample_start + jnp.arange(chunk_samples, dtype=jnp.int32)
        pix = jnp.repeat(pixel_ids, chunk_samples)          # (P*S,)
        samp = jnp.tile(sample_ids, p)                      # (P*S,)

        # Per-(pixel, sample) stream via two fold levels -- deliberately NOT
        # pixel*spp + sample, so the stream is independent of the target spp
        # and a checkpointed render resumed to a higher spp reproduces an
        # uninterrupted render bit-for-bit.
        keys = rrng.fold(rrng.ray_keys(base_key, pix), samp)
        px = pix % cam.image_width
        py = pix // cam.image_width
        origins, directions = rcamera.generate_rays(cam, keys, px, py)

        radiance, segments = trace_rays(
            scene, origins, directions, keys, max_depth, use_matmul=use_matmul
        )
    if sample_limit is not None:
        radiance = jnp.where((samp < sample_limit)[..., None], radiance, 0.0)
    radiance_sum = jnp.sum(radiance.reshape(p, chunk_samples, 3), axis=1)
    return radiance_sum, segments

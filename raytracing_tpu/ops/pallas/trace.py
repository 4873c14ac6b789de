"""Fused Pallas megakernel: full path tracing of a ray tile in VMEM.

This is the performance layer (SURVEY.md section 7, step 5) that replaces the
XLA wavefront's HBM-bound (B, N) intermediates. One kernel program traces a
tile of ``TILE`` rays through the ENTIRE bounce loop:

  * rays live as (T, 128) register tiles (T = TILE/128) -- full VPU lane
    utilization (the XLA path's (B, 3) arrays waste 125/128 lanes);
  * the sphere scene sits in VMEM in TRANSPOSED (N_pad, 8) layout (spheres on
    sublanes, attributes on lanes) so the intersection sweep is pure vector
    work: each inner step broadcasts a 128-sphere block (128, 1) against a
    128-ray group (1, 128) producing (128, 128) tiles -- no scalar loads in
    the hot loop and no (B, N) HBM traffic at all;
  * the closest-hit reduction is a per-block min over the sphere (sublane)
    axis plus an index-of-min derived from an iota compare;
  * the winning sphere's attributes are fetched with a mask-reduce "one-hot
    gather" (rows == idx), again pure vector work;
  * per-bounce RNG comes from the TPU core PRNG
    (``pltpu.prng_seed`` / ``prng_random_bits``), seeded by
    (seed, absolute-tile*depth+bounce) so results are deterministic and
    chunk-invariant for a fixed tile size.

Algorithm parity is with the reference recursion exactly as in
``models/integrator.py`` (ray.tracer.core.cc:236-265, object.defs.cc:41-81,
material.defs.cc:31-87); the RNG *streams* differ from the XLA wavefront path
(TPU PRNG vs threefry), so the two integrators agree distributionally, not
bitwise -- both match the reference within Monte-Carlo noise. On fully
deterministic scenes (fuzz-0 metals) the two paths agree to float roundoff
(tests/test_pallas.py).

Layout contract (host wrapper ``trace_rays_fused`` handles packing):
  rays_in   f32[6, R, 128]  rows ox,oy,oz,dx,dy,dz; R = B/128
  geom_t    f32[N_pad, 8]   cols cx,cy,cz,radius,(|c|^2-r^2),1/r,0,0  (VMEM)
  mats_t    f32[N_pad, 8]   cols alb_r,alb_g,alb_b,fuzz,ior,kind,0,0  (VMEM)
  meta      i32[4]          [n_actual, seed, tile_offset, unused]     (SMEM)
  out rad   f32[3, R, 128]  rows radiance r,g,b
  out stats i32[tiles*8, 128]  per-tile traced-segment count (broadcast tile)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...scene.types import Scene

# Rays per kernel program: 8 sublane-tiles of 128 lanes.
DEFAULT_TILE_RAYS = 1024
# Spheres per inner block (sublane dim of the (S, R) tiles). Small blocks
# give the per-block bounding-sphere cull finer granularity; 32 sublanes is
# still a whole number of (8, 128) vregs.
_SPHERE_BLOCK = 128

_T_MIN = 1.0e-4          # hit interval lower bound (core.cc:243)
_T_FAR = 3.0e38          # "no hit" sentinel (finite to keep arithmetic clean)
_SELF_HIT_OFFSET = 1.0e-3  # see models/integrator.SELF_HIT_OFFSET
_TWO_PI = 6.2831853071795864


def _uniform01(shape):
    """U[0,1) from the core PRNG: top 24 bits of the raw word.

    ``prng_random_bits`` yields a SIGNED int32-typed word; bitcast to uint32
    before the logical shift, then bitcast back so the int->float convert is
    of a small non-negative int32 (Mosaic has no uint32->f32 convert).
    """
    raw = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top24 = pltpu.bitcast(raw >> 8, jnp.int32)
    return top24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _trace_kernel(
    meta_ref,      # SMEM i32[6]: n_actual, seed, tile_offset, base-map, base
    cam_ref,       # SMEM f32[20]: camera frame (camera_mode only; else zeros)
    geom_ref,      # VMEM f32[N_pad, 8]
    mats_ref,      # VMEM f32[N_pad, 8]
    bounds_ref,    # SMEM f32[n_blocks, 8]: per-block bounding spheres
    rays_ref,      # VMEM f32[6, T, 128] (present only when not camera_mode)
    rad_ref=None,  # VMEM f32[3, T, 128]
    stats_ref=None,  # VMEM i32[8, 128]
    *,
    n_pad: int,
    max_depth: int,
    tile_shape: tuple[int, int],
    camera_mode: bool = False,
    chunk_samples: int = 1,
    pixel_order: str = "linear",
):
    if camera_mode:
        rad_ref, stats_ref = rays_ref, rad_ref  # shift: no rays input
        rays_ref = None
    n_actual = meta_ref[0]
    seed = meta_ref[1]
    tile_idx = meta_ref[2] + pl.program_id(0)
    t_sub = tile_shape[0]
    n_blocks = n_pad // _SPHERE_BLOCK

    zero = jnp.zeros(tile_shape, jnp.float32)
    one = zero + 1.0

    if camera_mode:
        # ---- in-kernel thin-lens camera ray generation -------------------
        # (batched get_ray, ray.tracer.core.cc:218-234). Work slot =
        # base + ray_offset // chunk_samples; the slot -> pixel map is either
        # "linear" (pid = slot; px/py by division) or "tiled" (32x32 pixel
        # tiles, runtime/tiling.py -- MUST match tiled_pixel_ids). All float
        # index math is exact for slots < 2^23.
        map_param = meta_ref[3].astype(jnp.float32)  # width | tiles_per_row
        base_f = meta_ref[4].astype(jnp.float32)
        off = (
            jax.lax.broadcasted_iota(jnp.int32, tile_shape, 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, tile_shape, 1)
            + pl.program_id(0) * (t_sub * 128)
        ).astype(jnp.float32)
        if chunk_samples == 1:
            slot = base_f + off
        else:
            slot = base_f + jnp.floor(
                (off + 0.5) * jnp.float32(1.0 / chunk_samples)
            )
        if pixel_order == "tiled":
            # runtime/tiling.py mapping (TILE_W = TILE_H = 32).
            tile_id = jnp.floor((slot + 0.5) * jnp.float32(1.0 / 1024.0))
            within = slot - tile_id * 1024.0
            wy = jnp.floor((within + 0.5) * jnp.float32(1.0 / 32.0))
            wx = within - wy * 32.0
            ty = jnp.floor((tile_id + 0.5) / map_param)
            tx = tile_id - ty * map_param
            pxf = tx * 32.0 + wx
            pyf = ty * 32.0 + wy
        else:
            pyf = jnp.floor((slot + 0.5) / map_param)
            pxf = slot - pyf * map_param

        # Camera RNG stream: the (max_depth)'th sub-stream of this tile
        # (bounces use 0..max_depth-1).
        pltpu.prng_seed(
            seed, tile_idx * jnp.int32(max_depth + 1) + jnp.int32(max_depth)
        )
        j1 = _uniform01(tile_shape) - 0.5
        j2 = _uniform01(tile_shape) - 0.5
        u3 = _uniform01(tile_shape)
        u4 = _uniform01(tile_shape)
        dr = jnp.sqrt(u3)
        dth = _TWO_PI * u4
        lens_u = dr * jnp.cos(dth)
        lens_v = dr * jnp.sin(dth)

        fx = pxf + j1
        fy = pyf + j2
        use_disk = cam_ref[18] > 0.0  # defocus_angle (core.cc:228)
        lens_u = jnp.where(use_disk, lens_u, 0.0)
        lens_v = jnp.where(use_disk, lens_v, 0.0)
        ox0 = cam_ref[9] + lens_u * cam_ref[12] + lens_v * cam_ref[15]
        oy0 = cam_ref[10] + lens_u * cam_ref[13] + lens_v * cam_ref[16]
        oz0 = cam_ref[11] + lens_u * cam_ref[14] + lens_v * cam_ref[17]
        dx0 = cam_ref[0] + fx * cam_ref[3] + fy * cam_ref[6] - ox0
        dy0 = cam_ref[1] + fx * cam_ref[4] + fy * cam_ref[7] - oy0
        dz0 = cam_ref[2] + fx * cam_ref[5] + fy * cam_ref[8] - oz0
    else:
        ox0 = rays_ref[0]
        oy0 = rays_ref[1]
        oz0 = rays_ref[2]
        dx0 = rays_ref[3]
        dy0 = rays_ref[4]
        dz0 = rays_ref[5]

    # (S, R) block iota over the sphere (sublane) axis.
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (_SPHERE_BLOCK, 128), dimension=0
    )

    state = (
        ox0, oy0, oz0, dx0, dy0, dz0,
        one, one, one,          # throughput rgb
        zero, zero, zero,       # radiance rgb
        one,                    # alive mask as f32 (Mosaic can't carry i1
                                # vectors through while_loop)
        jnp.int32(0),           # bounce
        jnp.int32(0),           # segments
    )

    def cond(state):
        alive_f = state[12]
        bounce = state[13]
        return (bounce < max_depth) & (jnp.max(alive_f) > 0.5)

    def body(state):
        (ox, oy, oz, dx, dy, dz,
         tpr, tpg, tpb, rr, rg, rb, alive_f, bounce, segments) = state

        # Per-ray quadratic constants for this bounce.
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        d_dot_o = dx * ox + dy * oy + dz * oz
        o_dot_o = ox * ox + oy * oy + oz * oz

        # ---- closest hit: block-outer sweep with a tile-wide conservative
        # bounding-sphere cull. One (T, 128) full-utilization test per sphere
        # block decides whether ANY live ray's interval [T_MIN, current-best)
        # can intersect the block's bounding sphere; only then does the
        # (sphere x ray-group) fine sweep run.
        def blk_step(blk, carry):
            t_b, i_b = carry  # (T, 128) each
            base = pl.multiple_of(blk * _SPHERE_BLOCK, _SPHERE_BLOCK)

            bcx = bounds_ref[blk, 0]
            bcy = bounds_ref[blk, 1]
            bcz = bounds_ref[blk, 2]
            brad = bounds_ref[blk, 3]
            hb = bcx * dx + bcy * dy + bcz * dz - d_dot_o          # (T, 128)
            cb = (
                (bcx * bcx + bcy * bcy + bcz * bcz)
                - 2.0 * (bcx * ox + bcy * oy + bcz * oz)
                + o_dot_o
                - brad * brad
            )
            deltab = hb * hb - a * cb
            sqb = jnp.sqrt(jnp.maximum(deltab, 0.0))
            nearb = (hb - sqb) * inv_a
            farb = (hb + sqb) * inv_a
            could_hit = jnp.any(
                (deltab >= 0.0)
                & (farb > _T_MIN)
                & (nearb < t_b)
                & (alive_f > 0.5)
            )

            def full_test(carry):
                t_b, i_b = carry
                cblk = geom_ref[pl.ds(base, _SPHERE_BLOCK), :]  # (S, 8)
                cx = cblk[:, 0:1]
                cy = cblk[:, 1:2]
                cz = cblk[:, 2:3]
                cm2 = cblk[:, 4:5]
                sphere_ids = row_ids + base

                t_rows = []
                i_rows = []
                for g in range(t_sub):
                    # h = d.(c-o); cq = |o-c|^2 - r^2 (object.defs.cc:43-46)
                    h = (
                        cx * dx[g : g + 1]
                        + cy * dy[g : g + 1]
                        + cz * dz[g : g + 1]
                        - d_dot_o[g : g + 1]
                    )                                              # (S, R)
                    cq = (
                        cm2
                        - 2.0 * (
                            cx * ox[g : g + 1]
                            + cy * oy[g : g + 1]
                            + cz * oz[g : g + 1]
                        )
                        + o_dot_o[g : g + 1]
                    )
                    delta = h * h - a[g : g + 1] * cq
                    sq = jnp.sqrt(jnp.maximum(delta, 0.0))
                    r1 = (h - sq) * inv_a[g : g + 1]
                    r2 = (h + sq) * inv_a[g : g + 1]
                    root = jnp.where(r1 > _T_MIN, r1, r2)
                    okay = (
                        (delta >= 0.0)
                        & (root > _T_MIN)
                        & (sphere_ids < n_actual)
                    )
                    tc = jnp.where(okay, root, _T_FAR)

                    # Block-min over the sphere axis + index of the winner.
                    t_min = jnp.min(tc, axis=0, keepdims=True)     # (1, R)
                    i_min = jnp.min(
                        jnp.where(
                            tc <= t_min, sphere_ids, jnp.int32(0x7FFFFFFF)
                        ),
                        axis=0,
                        keepdims=True,
                    )
                    upd = t_min < t_b[g : g + 1]
                    t_rows.append(jnp.where(upd, t_min, t_b[g : g + 1]))
                    i_rows.append(jnp.where(upd, i_min, i_b[g : g + 1]))
                return (
                    jnp.concatenate(t_rows, axis=0),
                    jnp.concatenate(i_rows, axis=0),
                )

            return jax.lax.cond(could_hit, full_test, lambda c: c, carry)

        t_best, idx_best = jax.lax.fori_loop(
            0,
            n_blocks,
            blk_step,
            (zero + _T_FAR, jnp.zeros(tile_shape, jnp.int32)),
        )
        hitm = t_best < _T_FAR
        t_safe = jnp.where(hitm, t_best, 0.0)

        # ---- one-hot mask-reduce gather of the winning sphere's attributes --
        def gather_step(blk, accs):
            base = pl.multiple_of(blk * _SPHERE_BLOCK, _SPHERE_BLOCK)
            in_block = jnp.any(
                hitm & (idx_best >= base) & (idx_best < base + _SPHERE_BLOCK)
            )

            def do_gather(accs):
                cblk = geom_ref[pl.ds(base, _SPHERE_BLOCK), :]
                mblk = mats_ref[pl.ds(base, _SPHERE_BLOCK), :]
                vals = (
                    cblk[:, 0:1], cblk[:, 1:2], cblk[:, 2:3], cblk[:, 5:6],
                    mblk[:, 0:1], mblk[:, 1:2], mblk[:, 2:3], mblk[:, 3:4],
                    mblk[:, 4:5], mblk[:, 5:6],
                )
                news = [[] for _ in range(10)]
                for g in range(t_sub):
                    mask = (
                        (row_ids + base) == idx_best[g : g + 1]
                    ).astype(jnp.float32)
                    for j, v in enumerate(vals):
                        news[j].append(
                            accs[j][g : g + 1]
                            + jnp.sum(mask * v, axis=0, keepdims=True)
                        )
                return tuple(jnp.concatenate(n, axis=0) for n in news)

            return jax.lax.cond(in_block, do_gather, lambda a: a, accs)

        accs = jax.lax.fori_loop(
            0, n_blocks, gather_step, (zero,) * 10
        )
        (cxb, cyb, czb, invrb, albr, albg, albb, fuzzb, iorb, kindb) = accs

        # Hit point + front-face-corrected unit normal (object.defs.cc:11-18).
        px = ox + t_safe * dx
        py = oy + t_safe * dy
        pz = oz + t_safe * dz
        nx = (px - cxb) * invrb
        ny = (py - cyb) * invrb
        nz = (pz - czb) * invrb
        d_dot_n = dx * nx + dy * ny + dz * nz
        front = d_dot_n < 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        nx = nx * sgn
        ny = ny * sgn
        nz = nz * sgn

        # Sky on miss (core.cc:254-256).
        inv_len_d = jax.lax.rsqrt(a)
        sky_t = 0.5 * (dy * inv_len_d + 1.0)
        hit_f = jnp.where(hitm, 1.0, 0.0)
        skyw = alive_f * (1.0 - hit_f)
        rr = rr + skyw * tpr * (1.0 - sky_t + sky_t * 0.5)
        rg = rg + skyw * tpg * (1.0 - sky_t + sky_t * 0.7)
        rb = rb + skyw * tpb * (1.0 - sky_t + sky_t * 1.0)

        # --- per-bounce RNG ---------------------------------------------------
        # The TPU PRNG takes at most 2 seed words: pack (tile, bounce) into
        # one. Streams stay distinct for tile_idx < 2^31 / (max_depth + 1).
        pltpu.prng_seed(seed, tile_idx * jnp.int32(max_depth + 1) + bounce)
        u1 = _uniform01(tile_shape)
        u2 = _uniform01(tile_shape)
        u3 = _uniform01(tile_shape)
        # Uniform unit sphere direction: z = 2u-1, azimuth 2*pi*v.
        uz = 2.0 * u1 - 1.0
        us = jnp.sqrt(jnp.maximum(1.0 - uz * uz, 0.0))
        theta = _TWO_PI * u2
        ux = us * jnp.cos(theta)
        uy = us * jnp.sin(theta)

        # --- Lambertian (material.defs.cc:31-42) ------------------------------
        ldx = nx + ux
        ldy = ny + uy
        ldz = nz + uz
        tiny = (
            (jnp.abs(ldx) < 1e-8) & (jnp.abs(ldy) < 1e-8) & (jnp.abs(ldz) < 1e-8)
        )
        ldx = jnp.where(tiny, nx, ldx)
        ldy = jnp.where(tiny, ny, ldy)
        ldz = jnp.where(tiny, nz, ldz)

        # --- Metallic (material.defs.cc:44-55) --------------------------------
        two_ddn = 2.0 * d_dot_n * sgn  # d.n with the corrected normal
        rfx = dx - two_ddn * nx
        rfy = dy - two_ddn * ny
        rfz = dz - two_ddn * nz
        inv_rf = jax.lax.rsqrt(
            jnp.maximum(rfx * rfx + rfy * rfy + rfz * rfz, 1e-20)
        )
        mdx = rfx * inv_rf + fuzzb * ux
        mdy = rfy * inv_rf + fuzzb * uy
        mdz = rfz * inv_rf + fuzzb * uz
        met_ok = (mdx * nx + mdy * ny + mdz * nz) > 0.0

        # --- Dielectric (material.defs.cc:57-87) ------------------------------
        eta = jnp.where(front, 1.0 / iorb, iorb)
        udx = dx * inv_len_d
        udy = dy * inv_len_d
        udz = dz * inv_len_d
        cos_t = jnp.minimum(-(udx * nx + udy * ny + udz * nz), 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        cannot = (eta * sin_t) > 1.0
        r0 = (1.0 - eta) / (1.0 + eta)
        r0 = r0 * r0
        omc = 1.0 - cos_t
        omc2 = omc * omc
        schlick = r0 + (1.0 - r0) * omc2 * omc2 * omc
        choose_reflect = cannot | (schlick > u3)
        # reflect(ud, n)
        two_udn = 2.0 * (udx * nx + udy * ny + udz * nz)
        rdx = udx - two_udn * nx
        rdy = udy - two_udn * ny
        rdz = udz - two_udn * nz
        # refract(ud, n, eta)
        ppx = eta * (udx + cos_t * nx)
        ppy = eta * (udy + cos_t * ny)
        ppz = eta * (udz + cos_t * nz)
        k = 1.0 - (ppx * ppx + ppy * ppy + ppz * ppz)
        par = -jnp.sqrt(jnp.abs(k))
        tdx = ppx + par * nx
        tdy = ppy + par * ny
        tdz = ppz + par * nz
        ddx = jnp.where(choose_reflect, rdx, tdx)
        ddy = jnp.where(choose_reflect, rdy, tdy)
        ddz = jnp.where(choose_reflect, rdz, tdz)

        # --- blend by material kind (material.defs.cc:92-108) -----------------
        is_lam = kindb < 0.5
        is_met = (kindb >= 0.5) & (kindb < 1.5)
        ndx = jnp.where(is_lam, ldx, jnp.where(is_met, mdx, ddx))
        ndy = jnp.where(is_lam, ldy, jnp.where(is_met, mdy, ddy))
        ndz = jnp.where(is_lam, ldz, jnp.where(is_met, mdz, ddz))
        ok_f = jnp.where(is_met & ~met_ok, 0.0, 1.0)

        surv_f = alive_f * hit_f * ok_f
        survives = surv_f > 0.5
        tpr = jnp.where(survives, tpr * albr, tpr)
        tpg = jnp.where(survives, tpg * albg, tpg)
        tpb = jnp.where(survives, tpb * albb, tpb)

        # Restart offset along the side of the new direction (anti-acne,
        # models/integrator.py SELF_HIT_OFFSET).
        side = jnp.where((ndx * nx + ndy * ny + ndz * nz) >= 0.0, 1.0, -1.0)
        eps = _SELF_HIT_OFFSET * side
        ox = jnp.where(survives, px + eps * nx, ox)
        oy = jnp.where(survives, py + eps * ny, oy)
        oz = jnp.where(survives, pz + eps * nz, oz)
        dx = jnp.where(survives, ndx, dx)
        dy = jnp.where(survives, ndy, dy)
        dz = jnp.where(survives, ndz, dz)

        segments = segments + jnp.sum(alive_f).astype(jnp.int32)
        return (
            ox, oy, oz, dx, dy, dz,
            tpr, tpg, tpb, rr, rg, rb,
            surv_f, bounce + 1, segments,
        )

    state = jax.lax.while_loop(cond, body, state)
    rad_ref[0] = state[9]
    rad_ref[1] = state[10]
    rad_ref[2] = state[11]
    stats_ref[:, :] = jnp.full((8, 128), state[14], jnp.int32)


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton_order(centers: jnp.ndarray) -> jnp.ndarray:
    """Permutation sorting spheres along a 3D Morton curve (10 bits/axis).

    Spatially-close spheres land in the same 32-sphere block, which is what
    makes the per-block bounding-sphere cull effective.
    """
    lo = jnp.min(centers, axis=0)
    hi = jnp.max(centers, axis=0)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((centers - lo) * scale, 0.0, 1023.0).astype(jnp.uint32)
    code = (
        (_part1by2(q[:, 0]) << 2)
        | (_part1by2(q[:, 1]) << 1)
        | _part1by2(q[:, 2])
    )
    return jnp.argsort(code)


def pack_scene(scene: Scene, n_pad_multiple: int = _SPHERE_BLOCK):
    """Scene -> (geom_t f32[N_pad, 8], mats_t f32[N_pad, 8],
    bounds f32[n_blocks, 8], n_actual).

    Transposed layout: spheres on sublanes, attributes on lanes, so the
    kernel's sphere-block slices broadcast against ray rows without any
    transposition. Spheres are Morton-sorted so each ``_SPHERE_BLOCK``-sphere
    block is spatially compact; ``bounds`` holds each block's bounding sphere
    [bcx, bcy, bcz, br, ...] for the kernel's conservative cull. Padding
    spheres (radius 0 at the last real center) never hit and are additionally
    masked by the ``sphere_id < n_actual`` test; they do not inflate bounds.
    """
    n = scene.num_objects
    n_pad = max(-(-n // n_pad_multiple) * n_pad_multiple, n_pad_multiple)

    if n > 0:
        order = _morton_order(scene.centers)
        centers = scene.centers[order]
        radii = scene.radii[order]
        albedo = scene.albedo[order]
        fuzz = scene.fuzz[order]
        ior = scene.ior[order]
        kind = scene.mat_kind[order].astype(jnp.float32)
        pad = n_pad - n
        pad_center = centers[-1]
        centers = jnp.concatenate(
            [centers, jnp.tile(pad_center[None], (pad, 1))], axis=0
        )
        radii = jnp.pad(radii, (0, pad))
        albedo = jnp.pad(albedo, ((0, pad), (0, 0)))
        fuzz = jnp.pad(fuzz, (0, pad))
        ior = jnp.pad(ior, (0, pad), constant_values=1.0)
        kind = jnp.pad(kind, (0, pad))
    else:
        centers = jnp.full((n_pad, 3), 1.0e9, jnp.float32)
        radii = jnp.zeros((n_pad,), jnp.float32)
        albedo = jnp.zeros((n_pad, 3), jnp.float32)
        fuzz = jnp.zeros((n_pad,), jnp.float32)
        ior = jnp.ones((n_pad,), jnp.float32)
        kind = jnp.zeros((n_pad,), jnp.float32)

    cm2 = jnp.sum(centers * centers, axis=-1) - radii * radii
    inv_r = jnp.where(radii > 0.0, 1.0 / jnp.maximum(radii, 1e-30), 0.0)
    zcol = jnp.zeros_like(radii)
    geom_t = jnp.stack(
        [centers[:, 0], centers[:, 1], centers[:, 2], radii, cm2, inv_r,
         zcol, zcol],
        axis=1,
    )
    mats_t = jnp.stack(
        [albedo[:, 0], albedo[:, 1], albedo[:, 2], fuzz, ior, kind,
         zcol, zcol],
        axis=1,
    )

    # Per-block bounding spheres: center = bbox midpoint of the block's
    # sphere centers, radius = max(|c_i - bc| + r_i).
    n_blocks = n_pad // n_pad_multiple
    cblk = centers.reshape(n_blocks, n_pad_multiple, 3)
    rblk = radii.reshape(n_blocks, n_pad_multiple)
    bc = 0.5 * (jnp.min(cblk, axis=1) + jnp.max(cblk, axis=1))
    br = jnp.max(
        jnp.linalg.norm(cblk - bc[:, None, :], axis=-1) + rblk, axis=1
    )
    bounds = jnp.concatenate(
        [bc, br[:, None], jnp.zeros((n_blocks, 4), jnp.float32)], axis=1
    )
    return (
        geom_t.astype(jnp.float32),
        mats_t.astype(jnp.float32),
        bounds.astype(jnp.float32),
        n,
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "tile_rays", "interpret"),
)
def trace_rays_fused(
    scene: Scene,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    seed: jnp.ndarray,
    tile_offset: jnp.ndarray,
    max_depth: int,
    *,
    tile_rays: int = DEFAULT_TILE_RAYS,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Trace ``B`` rays (B divisible by ``tile_rays``) with the megakernel.

    Args:
      seed: int32 scalar -- sampling stream id.
      tile_offset: int32 scalar -- absolute index of the first tile (so a
        chunked/sharded caller keeps globally-stable per-tile RNG streams).

    Returns:
      ``(radiance[B, 3], segments scalar int32)``.
    """
    b = origins.shape[0]
    if b % tile_rays != 0:
        raise ValueError(f"ray count {b} not divisible by tile_rays {tile_rays}")
    num_tiles = b // tile_rays
    t_sub = tile_rays // 128

    geom_t, mats_t, bounds, n_actual = pack_scene(scene)
    n_pad = geom_t.shape[0]

    rays = jnp.concatenate([origins.T, directions.T], axis=0)  # (6, B)
    rays = rays.reshape(6, b // 128, 128)

    meta = (
        jnp.array([n_actual, 0, 0, 0, 0, 0], jnp.int32)
        .at[1].set(seed.astype(jnp.int32))
        .at[2].set(tile_offset.astype(jnp.int32))
    )
    cam_zeros = jnp.zeros((20,), jnp.float32)

    kernel = functools.partial(
        _trace_kernel,
        n_pad=n_pad,
        max_depth=max_depth,
        tile_shape=(t_sub, 128),
    )

    rad, stats = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam (unused)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geom_t
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mats_t
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bounds
            pl.BlockSpec(
                (6, t_sub, 128),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (3, t_sub, 128),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, b // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(meta, cam_zeros, geom_t, mats_t, bounds, rays)

    radiance = rad.reshape(3, b).T
    segments = jnp.sum(stats.reshape(num_tiles, 8, 128)[:, 0, 0])
    return radiance, segments


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_rays", "chunk_samples", "max_depth", "pixel_order", "tile_rays",
        "interpret",
    ),
)
def render_camera_fused(
    scene: Scene,
    pixel00: jnp.ndarray,
    pixel_delta_u: jnp.ndarray,
    pixel_delta_v: jnp.ndarray,
    center: jnp.ndarray,
    defocus_disk_u: jnp.ndarray,
    defocus_disk_v: jnp.ndarray,
    defocus_angle: jnp.ndarray,
    map_param: jnp.ndarray,
    slot_base: jnp.ndarray,
    seed: jnp.ndarray,
    tile_offset: jnp.ndarray,
    num_rays: int,
    chunk_samples: int,
    max_depth: int,
    *,
    pixel_order: str = "linear",
    tile_rays: int = DEFAULT_TILE_RAYS,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fully fused wave: camera ray generation + path trace in one kernel.

    Ray ``i`` (of ``num_rays``) samples work slot
    ``slot_base + i // chunk_samples`` with thin-lens jitter drawn from the
    per-tile camera RNG stream; the slot -> pixel map is ``pixel_order``:
    "linear" (``map_param`` = image width, pid = slot) or "tiled" 32x32 pixel
    tiles (``map_param`` = tiles-per-row, see runtime/tiling.py). Removes all
    per-ray HBM input traffic (the rays never exist outside VMEM).

    Returns ``(radiance[num_rays, 3], segments scalar int32)``.
    """
    b = num_rays
    if b % tile_rays != 0:
        raise ValueError(f"ray count {b} not divisible by tile_rays {tile_rays}")
    num_tiles = b // tile_rays
    t_sub = tile_rays // 128

    geom_t, mats_t, bounds, n_actual = pack_scene(scene)
    n_pad = geom_t.shape[0]

    meta = (
        jnp.array([n_actual, 0, 0, 0, 0, 0], jnp.int32)
        .at[1].set(seed.astype(jnp.int32))
        .at[2].set(tile_offset.astype(jnp.int32))
        .at[3].set(jnp.asarray(map_param, jnp.int32))
        .at[4].set(slot_base.astype(jnp.int32))
    )
    cam_vec = jnp.concatenate(
        [
            jnp.asarray(pixel00, jnp.float32),
            jnp.asarray(pixel_delta_u, jnp.float32),
            jnp.asarray(pixel_delta_v, jnp.float32),
            jnp.asarray(center, jnp.float32),
            jnp.asarray(defocus_disk_u, jnp.float32),
            jnp.asarray(defocus_disk_v, jnp.float32),
            jnp.asarray(defocus_angle, jnp.float32).reshape(1),
            jnp.zeros((1,), jnp.float32),
        ]
    )

    kernel = functools.partial(
        _trace_kernel,
        n_pad=n_pad,
        max_depth=max_depth,
        tile_shape=(t_sub, 128),
        camera_mode=True,
        chunk_samples=chunk_samples,
        pixel_order=pixel_order,
    )

    rad, stats = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geom_t
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mats_t
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bounds
        ],
        out_specs=[
            pl.BlockSpec(
                (3, t_sub, 128),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, b // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(meta, cam_vec, geom_t, mats_t, bounds)

    radiance = rad.reshape(3, b).T
    segments = jnp.sum(stats.reshape(num_tiles, 8, 128)[:, 0, 0])
    return radiance, segments

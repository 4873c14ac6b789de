"""Measured per-segment cost split of the cover-scene megakernel loop.

VERDICT round-2 item 5 asked for a re-measured split of the ~7-8
cyc/segment loop (the round-1 split -- gather ~5 / sweep ~4 / shade+RNG
~2 of 11.2 -- predates the MXU gather, the block-major restructure and
the straggler fix). Method: a probe kernel that reproduces the
production regen-loop body (same pieces: scatter draws, flat _sweep,
_gather_mxu winner fetch, exact-root recompute, full branchless shade,
camera regen) but runs a FIXED fori step count with every lane always
active, so per-step cost is independent of path dynamics and two step
counts give a dispatch-floor-free slope:

    cyc/segment = (wall(K2) - wall(K1)) * CLK / ((K2-K1) * slots)

Variants REMOVE one piece (replaced by a cheap data-dependent stand-in
so Mosaic cannot fold the rest away):

    full      sweep + one-hot MXU gather + shade/RNG/regen (production)
    nogather  winner columns synthesized from imin (no one-hot, no matmul)
    nosweep   kmin synthesized from ray bits (no 512-row sweep either)
    base      neither closest hit nor gather (loop + RNG + shade + regen)

full-nogather = MXU gather cost; nogather-nosweep = sweep cost; base =
everything else. Expected (analysis): sweep ~12 fused vector ops x 512
rows / (8 sublanes x 128 lanes) ~ 6 vreg-ops/segment; one-hot build 2
ops x (512, 128)/group ~ 1; shade+RNG+camera ~ 230 ops on (8, 128)
tiles ~ 0.25. Run on a HEALTHY tunnel, never alongside pytest.

Usage (real TPU):
  PYTHONPATH=/root/.axon_site:. python scripts/probe_segment_split.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import raytracing_tpu as rt
import raytracing_tpu.ops.pallas.trace as T

CLK = 0.94e9  # v5e core clock (CLAUDE.md kernel perf log convention)


def make_kernel(variant: str, steps: int, n_pad: int, t_sub: int = 8):
    mxu_cols = 6  # untextured cover layout

    def kernel(seed_ref, cam_ref, geh_ref, gec_ref, shade_ref, mxu_ref,
               rad_ref):
        tile_shape = (t_sub, 128)
        zero = jnp.zeros(tile_shape, jnp.float32)
        zero_i = jnp.zeros(tile_shape, jnp.int32)
        one = zero + 1.0
        pack_mask = (1 << T._pack_bits(n_pad)) - 1

        # Fixed pixel grid + RNG streams (slot = lane index).
        slot_i = (
            jax.lax.broadcasted_iota(jnp.int32, tile_shape, 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, tile_shape, 1)
        )
        pxf = (slot_i % 400).astype(jnp.float32)
        pyf = (slot_i // 400).astype(jnp.float32)
        # Traced seed: the tunnel DEDUPES identical executions (CLAUDE.md),
        # so every timed call must differ in an argument.
        seed_h = T._fmix32(seed_ref[0] + jnp.int32(T._GOLD))
        slot_h = slot_i * jnp.int32(-1640531535) + seed_h

        def draws(sample_v, depth_v):
            return tuple(
                T._uniform01_keyed(slot_h, sample_v, depth_v, j)
                for j in (0, 1, 2)
            )

        u0 = draws(zero_i, zero_i)
        o0 = T._camera_rays(cam_ref, pxf, pyf, u0[0], u0[1], u0[2], u0[2])

        def body(it, state):
            (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr, rg, rb) = state
            rows = (ox, oy, oz, dx, dy, dz)
            depth = zero_i + it
            u1, u2, u3 = draws(depth, depth)

            a = dx * dx + dy * dy + dz * dz
            d_dot_o = dx * ox + dy * oy + dz * oz

            if variant in ("full", "nogather"):
                kmin = T._sweep(
                    geh_ref, gec_ref, rows, n_pad=n_pad, t_sub=t_sub
                )
            else:
                # Synthetic key: data-dependent, in-range, ~4 ops.
                kb = T.pltpu.bitcast(dy, jnp.int32)
                kmin = (kb & ~pack_mask) | (kb & pack_mask)
            nohit_key = T._f32_bits(T._BIGF) & ~pack_mask
            hitm = kmin < nohit_key
            imin = kmin & pack_mask

            if variant == "full":
                cols = T._gather_mxu(
                    mxu_ref, imin, n_pad=n_pad, t_sub=t_sub,
                    n_cols=mxu_cols,
                )
                cxb = pltpu.bitcast(cols[0], jnp.float32)
                cyb = pltpu.bitcast(cols[1], jnp.float32)
                czb = pltpu.bitcast(cols[2], jnp.float32)
                rb_ = pltpu.bitcast(cols[3], jnp.float32)
                albr, albg, albb, param = T._mat_decode(cols[4], cols[5])
            else:
                # Synthetic winner columns from imin (~8 cheap ops).
                f = imin.astype(jnp.float32)
                cxb = f * 0.01
                cyb = f * -0.02
                czb = f * 0.005
                rb_ = f * 1e-4 + 0.2
                albr = f * 1e-5 + 0.3
                albg = albr
                albb = albr
                param = f * 1e-6 - 0.9

            # Exact winner root + full branchless shade (production ops).
            hq = cxb * dx + cyb * dy + czb * dz - d_dot_o
            ocx = ox - cxb
            ocy = oy - cyb
            ocz = oz - czb
            cqw = ocx * ocx + ocy * ocy + ocz * ocz - rb_ * rb_
            deltaw = jnp.maximum(hq * hq - a * cqw, 0.0)
            sqw = jnp.sqrt(deltaw)
            inv_a = 1.0 / a
            t1 = (hq - sqw) * inv_a
            t2 = (hq + sqw) * inv_a
            t = jnp.where(t1 > T._T_MIN, t1, t2)
            t_safe = jnp.where(hitm, t, 0.0)
            invrb = jnp.where(rb_ > 0.0, 1.0 / jnp.maximum(rb_, 1e-30), 0.0)
            px = ox + t_safe * dx
            py = oy + t_safe * dy
            pz = oz + t_safe * dz
            onx = (px - cxb) * invrb
            ony = (py - cyb) * invrb
            onz = (pz - czb) * invrb
            d_dot_n = dx * onx + dy * ony + dz * onz
            front = d_dot_n < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            nx = onx * sgn
            ny = ony * sgn
            nz = onz * sgn
            inv_len_d = jax.lax.rsqrt(a)
            sky_t = 0.5 * (dy * inv_len_d + 1.0)
            sky_r = 1.0 - sky_t + sky_t * 0.5
            sky_g = 1.0 - sky_t + sky_t * 0.7
            uz = 2.0 * u1 - 1.0
            us = jnp.sqrt(jnp.maximum(1.0 - uz * uz, 0.0))
            theta = T._TWO_PI * u2
            ux = us * jnp.cos(theta)
            uy = us * jnp.sin(theta)
            ldx = nx + ux
            ldy = ny + uy
            ldz = nz + uz
            tiny = (
                (jnp.abs(ldx) < 1e-8)
                & (jnp.abs(ldy) < 1e-8)
                & (jnp.abs(ldz) < 1e-8)
            )
            ldx = jnp.where(tiny, nx, ldx)
            ldy = jnp.where(tiny, ny, ldy)
            ldz = jnp.where(tiny, nz, ldz)
            two_ddn = 2.0 * d_dot_n * sgn
            rfx = dx - two_ddn * nx
            rfy = dy - two_ddn * ny
            rfz = dz - two_ddn * nz
            inv_rf = jax.lax.rsqrt(
                jnp.maximum(rfx * rfx + rfy * rfy + rfz * rfz, 1e-20)
            )
            mdx = rfx * inv_rf + param * ux
            mdy = rfy * inv_rf + param * uy
            mdz = rfz * inv_rf + param * uz
            met_ok = (mdx * nx + mdy * ny + mdz * nz) > 0.0
            iorb = param - 4.0
            eta = jnp.where(front, 1.0 / jnp.maximum(iorb, 1e-3), iorb)
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
            two_udn = 2.0 * (udx * nx + udy * ny + udz * nz)
            rdx = udx - two_udn * nx
            rdy = udy - two_udn * ny
            rdz = udz - two_udn * nz
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
            is_lam = param < -0.5
            is_diel = param > 2.5
            ndx = jnp.where(is_lam, ldx, jnp.where(is_diel, ddx, mdx))
            ndy = jnp.where(is_lam, ldy, jnp.where(is_diel, ddy, mdy))
            ndz = jnp.where(is_lam, ldz, jnp.where(is_diel, ddz, mdz))
            atr = jnp.where(is_diel, 1.0, albr)
            atg = jnp.where(is_diel, 1.0, albg)
            atb = jnp.where(is_diel, 1.0, albb)
            scat_ok = hitm & ~(~is_lam & ~is_diel & ~met_ok)

            miss = ~hitm
            missf = jnp.where(miss, 1.0, 0.0)
            rr = rr + missf * tpr * sky_r
            rg = rg + missf * tpg * sky_g
            rb = rb + missf * tpb * 1.0

            # Camera regen for dead lanes, like production (every step).
            j1, j2, c3 = draws(depth + 1, zero_i)
            cx, cy, cz, cdx, cdy, cdz = T._camera_rays(
                cam_ref, pxf, pyf, j1, j2, c3, j1
            )
            side = jnp.where(
                (ndx * nx + ndy * ny + ndz * nz) >= 0.0, 1.0, -1.0
            )
            eps = T._SELF_HIT_OFFSET * side
            ox = jnp.where(scat_ok, px + eps * nx, cx)
            oy = jnp.where(scat_ok, py + eps * ny, cy)
            oz = jnp.where(scat_ok, pz + eps * nz, cz)
            dx_ = jnp.where(scat_ok, ndx, cdx)
            dy_ = jnp.where(scat_ok, ndy, cdy)
            dz_ = jnp.where(scat_ok, ndz, cdz)
            tpr = jnp.where(scat_ok, tpr * atr, one)
            tpg = jnp.where(scat_ok, tpg * atg, one)
            tpb = jnp.where(scat_ok, tpb * atb, one)
            return (ox, oy, oz, dx_, dy_, dz_, tpr, tpg, tpb, rr, rg, rb)

        state = (*o0, one, one, one, zero, zero, zero)
        state = jax.lax.fori_loop(0, steps, body, state)
        rad_ref[0] = state[9]
        rad_ref[1] = state[10]
        rad_ref[2] = state[11] + state[0] + state[3]  # keep rays live

    return kernel


def run_variant(variant, steps, inputs, n_pad, num_tiles):
    kernel = make_kernel(variant, steps, n_pad)
    fn = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, 8, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (3, num_tiles * 8, 128), jnp.float32
        ),
    )
    f = jax.jit(lambda s, *a: fn(s, *a).sum())
    np.asarray(f(jnp.full((1,), 999, jnp.int32), *inputs))  # compile+warm
    best = np.inf
    for rep in range(5):
        # Seed varies per call: the tunnel dedupes identical executions.
        s = jnp.full((1,), 1000 + rep, jnp.int32)
        t0 = time.perf_counter()
        np.asarray(f(s, *inputs))  # axon: only a fetch reliably waits
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cam0, scene = rt.load_and_build("data/config/world.config.json")
    from raytracing_tpu.core import camera as C

    params = cam0
    frame = C.derive(params)
    cam_vec = jnp.concatenate(
        [
            jnp.asarray(frame.pixel00, jnp.float32),
            jnp.asarray(frame.pixel_delta_u, jnp.float32),
            jnp.asarray(frame.pixel_delta_v, jnp.float32),
            jnp.asarray(frame.center, jnp.float32),
            jnp.asarray(frame.defocus_disk_u, jnp.float32),
            jnp.asarray(frame.defocus_disk_v, jnp.float32),
            jnp.asarray(
                [params.defocus_angle, 0.0], jnp.float32
            ),
        ]
    )
    geom_h, geom_c, shade, n_actual = T.pack_scene(scene)
    n_pad = geom_h.shape[0]
    planes = T.pack_scene(scene, with_planes=6)[4]
    num_tiles = 64  # 64k slots: enough to hide per-program overhead
    inputs = (cam_vec, geom_h, geom_c, shade, planes)
    slots = num_tiles * 8 * 128

    K1, K2 = 64, 320
    print(f"n_pad={n_pad} slots={slots} K={K1}/{K2}", flush=True)
    results = {}
    for variant in ("full", "nogather", "nosweep", "base"):
        w1 = run_variant(variant, K1, inputs, n_pad, num_tiles)
        w2 = run_variant(variant, K2, inputs, n_pad, num_tiles)
        cyc = (w2 - w1) * CLK / ((K2 - K1) * slots)
        results[variant] = cyc
        print(
            f"{variant:9s} wall {w1*1e3:7.2f} / {w2*1e3:7.2f} ms"
            f"  -> {cyc:5.2f} cyc/segment",
            flush=True,
        )
    if {"full", "nogather", "nosweep", "base"} <= results.keys():
        print(
            f"split: gather={results['full']-results['nogather']:5.2f}"
            f" sweep={results['nogather']-results['nosweep']:5.2f}"
            f" shade/rng/regen/loop={results['base']:5.2f}"
            f" (synthetic-winner stand-in"
            f" {results['nosweep']-results['base']:+5.2f})",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

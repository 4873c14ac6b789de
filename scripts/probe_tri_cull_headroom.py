"""Mesh analog of probe_cull_headroom.py: price the TRIANGLE cull's
remaining headroom, and the cross-primitive seeding win, WITHOUT hardware.

Replays the mesh scene's wave dynamics (per-slot regen, per-tile
sequential block visits, per-lane best tightening) in numpy on the real
packed layout (pack_triangles order, _tri_blk-row blocks, AABB slab gate
— the shipped RT_CULL=box default) and counts visited triangle blocks per
segment-step under:

  cam        shipped static camera-order visits, NO hint (RT_CULL_HINT=0)
  cam_hint   same, with the sphere winner's exact t seeding each lane's
             upper bound before any block is visited (RT_CULL_HINT=1,
             the shipped default — see _bounce_core / _cull_gate_box)
  floor[_h]  ANY-order tile-vote visit floor, unhinted / hinted
  floor_group/lane  hinted floors at finer vote granularity (the
             measured-slower / toolchain-blocked routes, for the ledger)

The gate predicate drops the kernel's conservative margins (they only
widen borderline cases); sweep cost scales ~ visited blocks for the
sweep-bound mesh regime, so visit ratios predict throughput ratios.
Reference semantics anchor: the exact closest hit of
/root/reference/src/ray.tracer.object.defs.cc:68-81 extended to the
triangle family — all variants are conservative gates, preserving it by
construction.

Run (CPU, no tunnel needed):

  PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/probe_tri_cull_headroom.py \
      --sub 3 --width 256 --spp 16 --depth 8 --tiles 12
"""

from __future__ import annotations

import argparse
import dataclasses
import importlib.util
import pathlib
import time

import numpy as np

import jax
import jax.numpy as jnp

import raytracing_tpu as rt
from raytracing_tpu.core import camera as rcam
import raytracing_tpu.ops.pallas.trace as ptrace
from raytracing_tpu.runtime import tiling

_spec = importlib.util.spec_from_file_location(
    "probe_cull_headroom",
    pathlib.Path(__file__).parent / "probe_cull_headroom.py",
)
_sph = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_sph)

T_MIN = 1.0e-4
LANES = tiling.SLOTS_PER_TILE


def tri_candidates(o, d, v0, e1, e2, chunk=256):
    """Exact Moller-Trumbore candidate t per (lane, triangle) in numpy
    (validity identical to _tri_sweep's division-free form; +inf on miss).
    Blocked over triangles to bound the (L, chunk, 3) intermediates."""
    L = o.shape[0]
    M = v0.shape[0]
    out = np.full((L, M), np.inf, np.float32)
    for s in range(0, M, chunk):
        e = min(s + chunk, M)
        E1 = e1[None, s:e]                      # (1, C, 3)
        E2 = e2[None, s:e]
        h = np.cross(d[:, None, :], E2)          # (L, C, 3)
        det = np.sum(E1 * h, axis=2)
        g_s = np.where(det < 0.0, -1.0, 1.0)
        dabs = det * g_s
        sv = o[:, None, :] - v0[None, s:e]
        u_s = np.sum(sv * h, axis=2) * g_s
        q = np.cross(sv, np.broadcast_to(E1, sv.shape))
        v_s = np.sum(d[:, None, :] * q, axis=2) * g_s
        t_s = np.sum(E2 * q, axis=2) * g_s
        with np.errstate(divide="ignore", invalid="ignore"):
            t = t_s / np.maximum(dabs, 1.0e-30)
        valid = (
            (dabs > 1e-12) & (u_s >= 0.0) & (v_s >= 0.0)
            & (u_s + v_s <= dabs) & (t > T_MIN) & (t < 1.0e18)
        )
        out[:, s:e] = np.where(valid, t, np.inf).astype(np.float32)
    return out


def tri_box_bounds(tlo, thi, m_valid, blk):
    """Per-block AABBs over the triangles' vertex min/max rows, BLOCK
    order (== _tri_block_bounds box kind, widening pad dropped):
    lo (nb,3), hi (nb,3), nonempty (nb,)."""
    m_pad = tlo.shape[0]
    nb = m_pad // blk
    valid = (np.arange(m_pad) < m_valid).reshape(nb, blk, 1)
    big = np.float32(3.0e37)
    lo = np.min(np.where(valid, tlo.reshape(nb, blk, 3), big), axis=1)
    hi = np.max(np.where(valid, thi.reshape(nb, blk, 3), -big), axis=1)
    return (lo.astype(np.float32), hi.astype(np.float32),
            valid.any(axis=(1, 2)))


def vote_sim(order, act, nearg, wn, best0):
    """Sequential per-tile vote with an initial per-lane upper bound
    ``best0`` (the cross-primitive hint; +inf = unhinted)."""
    best = best0.copy()
    visits = 0
    for b in order:
        passes = act & np.isfinite(nearg[:, b]) & (nearg[:, b] <= best)
        if passes.any():
            visits += 1
            best = np.minimum(best, wn[:, b])
    return visits


def floor_counts(act, nearg, wn, best0, group):
    final = np.minimum(np.min(wn, axis=1), best0)
    passes = (act[:, None] & np.isfinite(nearg)
              & (nearg <= final[:, None]))
    L = act.shape[0]
    g = passes.reshape(L // group, group, -1).any(axis=1)
    return g.sum() * (group / L)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sub", type=int, default=3, help="icosphere subdivisions")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--tiles", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cam0, scene = rt.make_world_mesh(
        image_width=args.width, subdivisions=args.sub
    )
    cam = dataclasses.replace(
        cam0, samples_per_pixel=args.spp, max_depth=args.depth
    )
    dc = rcam.derive(cam)
    w, h = dc.image_width, dc.image_height

    # Spheres (3 in the mesh world): exact quadratic, single 128-row pad
    # block — NOT in the ledger (the kernel's sphere path is single-block
    # unculled here); they exist to produce winners, materials, and the
    # cross-primitive hint.
    (s_ctr, s_rad, s_kind, s_alb, s_fuzz, s_ior, s_n) = _sph.pack_arrays(
        scene
    )
    s_cm2 = np.sum(s_ctr * s_ctr, axis=1) - s_rad * s_rad
    s_cm2[s_n:] = 1.0e30

    # Triangles: pack order + 256-row cull blocks, per-block AABBs.
    tri_table, tri_m = ptrace.pack_triangles(scene)
    tt = np.asarray(tri_table)
    v0, e1, e2 = tt[:, 0:3], tt[:, 3:6], tt[:, 6:9]
    m_pad = tt.shape[0]
    blk = ptrace._tri_blk(m_pad)
    nb = m_pad // blk
    p1, p2 = v0 + e1, v0 + e2
    tlo = np.minimum(np.minimum(v0, p1), p2)
    thi = np.maximum(np.maximum(v0, p1), p2)
    blo, bhi, bne = tri_box_bounds(tlo, thi, tri_m, blk)
    t_kind = np.asarray(np.pad(np.asarray(scene.tri_mat_kind),
                               (0, m_pad - tri_m)))
    t_alb = np.asarray(np.pad(np.asarray(scene.tri_albedo),
                              ((0, m_pad - tri_m), (0, 0))))
    t_fuzz = np.asarray(np.pad(np.asarray(scene.tri_fuzz),
                               (0, m_pad - tri_m)))
    t_ior = np.asarray(np.pad(np.asarray(scene.tri_ior),
                              (0, m_pad - tri_m), constant_values=1.0))
    tn_geo = np.cross(e1, e2)
    nrm = np.linalg.norm(tn_geo, axis=1, keepdims=True)
    tn_geo = tn_geo / np.maximum(nrm, 1e-20)

    cam_center = np.asarray(dc.center)
    order_cam = np.argsort(_sph.box_gap_dist(blo, bhi, cam_center))

    ids = tiling.tiled_pixel_ids(w, h)
    n_tiles = ids.shape[0] // LANES
    tile_ids = list(range(n_tiles))
    if args.tiles:
        rng0 = np.random.default_rng(123)
        tile_ids = sorted(
            rng0.choice(n_tiles, size=args.tiles, replace=False)
        )

    keys = ("cam", "cam_hint", "floor", "floor_h", "floor_group_h",
            "floor_lane_h", "steps", "segments", "all_culled_h")
    tot = {k: 0.0 for k in keys}
    t0 = time.time()
    inf = np.full(LANES, np.inf, np.float32)
    for ti in tile_ids:
        lane_ids = ids[ti * LANES:(ti + 1) * LANES]
        valid_l = lane_ids < w * h
        px = (lane_ids % w).astype(np.float32)
        py = (lane_ids // w).astype(np.float32)
        rng = np.random.default_rng(args.seed * 100003 + ti)
        sample = np.where(valid_l, 0, args.spp)
        bounce = np.zeros(LANES, np.int32)
        o, d = _sph.camera_rays(dc, px, py, rng)

        while True:
            act = sample < args.spp
            if not act.any():
                break
            a = np.sum(d * d, axis=1)
            # Exact sphere winner (t units).
            h_full = d @ s_ctr.T - np.sum(d * o, axis=1)[:, None]
            cq = (s_cm2[None, :] - 2.0 * (o @ s_ctr.T)
                  + np.sum(o * o, axis=1)[:, None])
            delta = h_full * h_full - a[:, None] * cq
            sq = np.sqrt(np.maximum(delta, 0.0))
            near = h_full - sq
            far = h_full + sq
            ta_n = a * T_MIN
            root = np.where(near > ta_n[:, None], near, far)
            cand_s = np.where((delta >= 0.0) & (root > ta_n[:, None]),
                              root, np.inf).astype(np.float32)
            t_sph = cand_s.min(axis=1) / np.maximum(a, 1e-30)
            i_sph = np.argmin(cand_s, axis=1)

            # Exact triangle candidates (t units) + per-block minima.
            cand_t = tri_candidates(o, d, v0, e1, e2)
            wn = cand_t.reshape(LANES, nb, blk).min(axis=2)

            # Gate: slab windows in t units (a = 1 — triangle keys are
            # UNSCALED t), masked entry key.
            ones = np.ones_like(a)
            near_b, far_b = _sph.box_slab(o, d, ones, blo, bhi)
            nearg = _sph.masked_near(near_b, far_b, T_MIN * ones)
            nearg = np.where(bne[None, :], nearg, np.inf)

            hint = np.where(np.isfinite(t_sph), t_sph, np.inf
                            ).astype(np.float32)
            seg = int(act.sum())
            tot["segments"] += seg
            tot["steps"] += 1
            tot["cam"] += vote_sim(order_cam, act, nearg, wn, inf)
            v_h = vote_sim(order_cam, act, nearg, wn, hint)
            tot["cam_hint"] += v_h
            tot["all_culled_h"] += float(v_h == 0)
            tot["floor"] += floor_counts(act, nearg, wn, inf, LANES)
            tot["floor_h"] += floor_counts(act, nearg, wn, hint, LANES)
            tot["floor_group_h"] += floor_counts(act, nearg, wn, hint, 128)
            tot["floor_lane_h"] += floor_counts(act, nearg, wn, hint, 1)

            # Advance paths: combined exact closest hit -> scatter/regen.
            t_tri = wn.min(axis=1)
            i_tri = np.argmin(cand_t, axis=1)
            pick_t = t_tri < t_sph
            t_hit = np.where(pick_t, t_tri, t_sph)
            hit = np.isfinite(t_hit)
            p = o + t_hit[:, None] * d
            n_s = (p - s_ctr[i_sph]) / np.maximum(
                s_rad[i_sph], 1e-20)[:, None]
            normal = np.where(pick_t[:, None], tn_geo[i_tri], n_s)
            front = np.sum(d * normal, axis=1) < 0.0
            normal = np.where(front[:, None], normal, -normal)
            kind = np.where(pick_t, t_kind[i_tri], s_kind[i_sph])
            alb = np.where(pick_t[:, None], t_alb[i_tri], s_alb[i_sph])
            fz = np.where(pick_t, t_fuzz[i_tri], s_fuzz[i_sph])
            io = np.where(pick_t, t_ior[i_tri], s_ior[i_sph])
            uv = rng.standard_normal((LANES, 3)).astype(np.float32)
            uv /= np.maximum(np.linalg.norm(uv, axis=1, keepdims=True),
                             1e-12)
            nd, _, scat = _sph._scatter(
                jnp.asarray(d), jnp.asarray(normal), jnp.asarray(front),
                jnp.asarray(kind), jnp.asarray(alb), jnp.asarray(fz),
                jnp.asarray(io), jnp.asarray(uv),
                jnp.asarray(rng.random(LANES, np.float32)),
            )
            nd = np.asarray(nd)
            scat = np.asarray(scat)
            cont = act & hit & scat & (bounce + 1 < args.depth)
            ends = act & ~cont
            o = np.where(cont[:, None], p, o)
            d = np.where(cont[:, None], nd, d)
            bounce = np.where(cont, bounce + 1, bounce)
            sample = np.where(ends, sample + 1, sample)
            re = ends & (sample < args.spp)
            if re.any():
                ro, rd = _sph.camera_rays(dc, px, py, rng)
                o = np.where(re[:, None], ro, o)
                d = np.where(re[:, None], rd, d)
                bounce = np.where(re, 0, bounce)

    segs = tot["segments"]
    steps = tot["steps"]
    print(f"scene mesh:{args.sub} tris={tri_m} m_pad={m_pad} blocks={nb} "
          f"blk={blk} image {w}x{h} spp={args.spp} depth={args.depth} "
          f"tiles={len(tile_ids)}/{n_tiles} segments={segs:.0f} "
          f"steps={steps:.0f} ({time.time()-t0:.0f}s)")
    base = tot["cam"] / steps
    rows = (
        ("cam", "camera order, NO hint (RT_CULL_HINT=0)"),
        ("cam_hint", "camera order + sphere-winner hint (shipped)"),
        ("floor", "ANY-order tile floor, no hint"),
        ("floor_h", "ANY-order tile floor, hinted"),
        ("floor_group_h", "hinted floor at 128-lane group votes"),
        ("floor_lane_h", "hinted floor at per-lane traversal"),
    )
    print(f"{'variant':<16}{'blocks/step':>12}{'vs cam':>9}   note")
    for k, note in rows:
        v = tot[k] / steps
        print(f"{k:<16}{v:>12.3f}{base / max(v, 1e-9):>8.2f}x   {note}")
    print(f"hint empties the whole tile's triangle sweep on "
          f"{100 * tot['all_culled_h'] / steps:.1f}% of steps")


if __name__ == "__main__":
    main()

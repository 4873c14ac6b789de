"""Measure the per-block cull's remaining headroom WITHOUT hardware.

The round-3 conservative cull (``_cull_gate``) skips a stage-1 sweep block
when no active lane in the 1024-ray tile can hit the block's widened bound
strictly closer than its current best. CLAUDE.md records its measured limit:
"the cull vote is per 1024-ray tile -- only coherent (primary + regenerated
same-tile) rays skip; bounce rays collectively reach most blocks". This
probe quantifies exactly how much each candidate improvement could buy, by
simulating the kernel's wave dynamics (per-slot sample regen, per-tile
sequential block visits, per-lane best tightening) in numpy on the REAL
packed scene layout (Morton order, 512-row blocks, widened bounding
spheres) and counting visited blocks per segment under:

  cam      the production ordering: front-to-back from the camera center,
           fixed per scene (matches ``_order_bounds``).
  adapt    a per-(tile, step) ordering by distance from the ACTIVE lanes'
           origin centroid -- what an in-kernel SMEM multi-order table
           could approximate (upper bound for that idea).
  oracle   per-(tile, step) blocks ordered by how many lanes' TRUE winner
           they contain (descending) -- unimplementable, bounds ANY
           ordering heuristic.
  floor    order-independent lower bound at each vote granularity: a block
           must be visited if any [tile|128-lane group|single lane] passes
           the gate given the lane's FINAL best. No ordering can do better
           at that granularity; 'lane' is the idealized per-lane traversal
           Mosaic's missing dynamic gathers currently forbid.

Fidelity notes: path evolution reuses the package's real ``scatter`` op and
camera math; RNG streams differ from the kernel (statistical, not
bit-exact, comparisons). The gate predicate drops the kernel's tiny
conservative margins (they only widen borderline cases). Sweep cost at
stress scales ~ visited blocks, so visit ratios predict throughput ratios
for the sweep-bound regime (stress:8192 = 7.9 Mrays/s culled vs 4.4
unculled on hardware, sphere-gate era).

``--bound box`` (default, matching the shipped RT_CULL default since the
box gate won its hardware A/B) evaluates the same orderings/floors under
the per-block AABB slab gate; ``--bound sphere`` reproduces the original
bounding-sphere numbers recorded in CLAUDE.md/BASELINE.md.

Box runs additionally price SUB-BOX refinement (K = 2/4/8 AABBs per
512-row block, each bounding a contiguous Morton sub-range): the gate for
a block becomes "any sub-box hittable strictly closer than best", i.e.
a masked MIN over K slab nears -- K more slab tests per block but still
ONE scalar cond, sidestepping the measured-rejected per-group/finer-block
cond overheads. The kernel-side cost is a few extra vreg ops per block
per segment, negligible next to a 512-row sweep body, so any material
drop in visited blocks/step here is nearly-free hardware throughput.

Run (CPU, no tunnel needed):

  PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/probe_cull_headroom.py \
      --n 8192 --width 256 --spp 16 --depth 8

Reference for the capability this feeds: the fixed-function closest-hit
loop of ``/root/reference/src/ray.tracer.object.defs.cc:68-81`` -- any cull
must preserve its exact winner, which all simulated variants do by
construction (conservative gates only).
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

import raytracing_tpu as rt
from raytracing_tpu.core import camera as rcam
from raytracing_tpu.ops import scatter as rscatter
import raytracing_tpu.ops.pallas.trace as ptrace
from raytracing_tpu.runtime import tiling

T_MIN = 1.0e-4
LANES = tiling.SLOTS_PER_TILE  # 1024 = one kernel tile / cull vote scope


def pack_arrays(scene):
    """Morton-packed centers/radii/material columns, padded like pack_scene."""
    order = np.asarray(ptrace._morton_order(scene.centers))
    centers = np.asarray(scene.centers)[order]
    radii = np.asarray(scene.radii)[order]
    kind = np.asarray(scene.mat_kind)[order]
    albedo = np.asarray(scene.albedo)[order]
    fuzz = np.asarray(scene.fuzz)[order]
    ior = np.asarray(scene.ior)[order]
    n = centers.shape[0]
    n_pad = max(ptrace._SPHERE_BLOCK, 1 << max(n - 1, 1).bit_length())
    pad = n_pad - n
    centers = np.concatenate([centers, np.tile(centers[-1:], (pad, 1))])
    radii = np.pad(radii, (0, pad))
    kind = np.pad(kind, (0, pad))
    albedo = np.pad(albedo, ((0, pad), (0, 0)))
    fuzz = np.pad(fuzz, (0, pad))
    ior = np.pad(ior, (0, pad), constant_values=1.0)
    return centers, radii, kind, albedo, fuzz, ior, n


def block_bounds(centers, radii, n_valid, blk):
    """Widened per-block bounding spheres, BLOCK order (== _block_bounds
    sphere kind before visit-sorting): ctr (nb,3), rad (nb,), bm2 (nb,)."""
    n_pad = centers.shape[0]
    nb = n_pad // blk
    valid = (np.arange(n_pad) < n_valid).reshape(nb, blk, 1)
    c = centers.reshape(nb, blk, 3)
    r = radii.reshape(nb, blk, 1)
    big = np.float32(3.0e37)
    lo = np.min(np.where(valid, c - r, big), axis=1)
    hi = np.max(np.where(valid, c + r, -big), axis=1)
    ctr = 0.5 * (lo + hi)
    dist = np.sqrt(np.sum((c - ctr[:, None, :]) ** 2, axis=-1, keepdims=True)) + r
    rad = np.max(np.where(valid, dist, 0.0), axis=1)[:, 0]
    rad = rad * 1.001 + 1.0e-3
    bm2 = np.sum(ctr * ctr, axis=1) - rad * rad
    return ctr, rad, bm2


def box_bounds(centers, radii, n_valid, blk):
    """Per-block AABBs over c -+ r, BLOCK order (== _box_block_bounds with
    the widening pad dropped): lo (nb,3), hi (nb,3), nonempty (nb,).
    A box with NO valid rows (possible for fine sub-boxes on padded
    scenes) is inverted +-big; its slab windows can degenerate to
    always-hit, so callers must mask with ``nonempty``."""
    n_pad = centers.shape[0]
    nb = n_pad // blk
    valid = (np.arange(n_pad) < n_valid).reshape(nb, blk, 1)
    c = centers.reshape(nb, blk, 3)
    r = radii.reshape(nb, blk, 1)
    big = np.float32(3.0e37)
    lo = np.min(np.where(valid, c - r, big), axis=1)
    hi = np.max(np.where(valid, c + r, -big), axis=1)
    return (lo.astype(np.float32), hi.astype(np.float32),
            valid.any(axis=(1, 2)))


def box_gap_dist(lo, hi, p):
    """Euclidean distance from point ``p`` to each AABB (0 inside) -- the
    front-to-back visit metric _box_block_bounds uses."""
    gap = np.maximum(np.maximum(lo - p[None], p[None] - hi), 0.0)
    return np.sqrt(np.sum(gap * gap, axis=1))


def box_slab(o, d, a, lo, hi):
    """Exact slab windows per (lane, box) in the kernel's a*t key units
    (margins dropped, sign-preserving inv clamp like _gate_pre):
    near_b (L, nB), far_b (L, nB); inverted windows (miss) -> (inf, -inf)
    via the caller's comparisons (near > best always, far <= ta)."""
    inv = np.where(d >= 0.0, 1.0, -1.0) / np.maximum(np.abs(d), 1.0e-30)
    oi = o * inv
    t1 = lo[None, :, :] * inv[:, None, :] - oi[:, None, :]
    t2 = hi[None, :, :] * inv[:, None, :] - oi[:, None, :]
    tn = np.min([t1, t2], axis=0).max(axis=2)
    tf = np.max([t1, t2], axis=0).min(axis=2)
    near_b = np.where(tn <= tf, tn, np.inf) * a[:, None]
    far_b = np.where(tn <= tf, tf, -np.inf) * a[:, None]
    return near_b.astype(np.float32), far_b.astype(np.float32)


def masked_near(near_b, far_b, ta):
    """Collapse a (near, far) gate window to ONE per-(lane, box) quantity:
    the entry key where the box is reachable strictly past t_min, +inf
    where it is not. The gate predicate then reduces to
    ``isfinite(nearg) & (nearg <= best)`` -- and K sub-boxes per block
    compose by a plain MIN over K, which is what makes the sub-box
    refinement one-cond-per-block implementable in the kernel."""
    return np.where(far_b > ta[:, None], near_b, np.inf).astype(np.float32)


def camera_rays(dc, px, py, rng):
    """get_ray (core.cc:218-234) in numpy, defocus_angle == 0 scenes."""
    jit = rng.random((px.shape[0], 2), np.float32) - 0.5
    fx = px.astype(np.float32) + jit[:, 0]
    fy = py.astype(np.float32) + jit[:, 1]
    p00 = np.asarray(dc.pixel00)
    du = np.asarray(dc.pixel_delta_u)
    dv = np.asarray(dc.pixel_delta_v)
    sample = p00[None] + fx[:, None] * du[None] + fy[:, None] * dv[None]
    o = np.broadcast_to(np.asarray(dc.center)[None], sample.shape).copy()
    return o, (sample - o).astype(np.float32)


_scatter = jax.jit(rscatter.scatter)


def vote_sim(order, act, nearg, wn):
    """Sequential per-tile vote: visit blocks in ``order``; a visited
    block's exact winners tighten every lane's best for later gates.
    ``nearg`` is the masked entry key (see masked_near). Returns
    visited-block count."""
    best = np.full(act.shape[0], np.inf, np.float32)
    visits = 0
    for b in order:
        passes = act & np.isfinite(nearg[:, b]) & (nearg[:, b] <= best)
        if passes.any():
            visits += 1
            best = np.minimum(best, wn[:, b])
    return visits


def floor_counts(act, nearg, wn, group):
    """Order-independent visit floor at ``group``-lane vote granularity,
    in units of full-block sweeps (fractional for sub-tile granularity)."""
    final = np.min(wn, axis=1)  # (L,) best possible key per lane
    passes = (act[:, None] & np.isfinite(nearg)
              & (nearg <= final[:, None]))
    L = act.shape[0]
    g = passes.reshape(L // group, group, -1).any(axis=1)  # (groups, nb)
    return g.sum() * (group / L)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--tiles", type=int, default=0, help="subsample tiles (0=all)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bound", choices=("box", "sphere"), default="box",
                    help="gate bound kind (box = shipped RT_CULL default)")
    args = ap.parse_args()

    cam0, scene = rt.make_world_stress(args.n, image_width=args.width)
    cam = dataclasses.replace(
        cam0, samples_per_pixel=args.spp, max_depth=args.depth
    )
    dc = rcam.derive(cam)
    w, h = dc.image_width, dc.image_height
    centers, radii, kind, albedo, fuzz, ior, n_valid = pack_arrays(scene)
    n_pad = centers.shape[0]
    blk = min(n_pad, ptrace._SWEEP_ROWS)
    nb = n_pad // blk
    ctr, rad, bm2 = block_bounds(centers, radii, n_valid, blk)
    blo, bhi, _ = box_bounds(centers, radii, n_valid, blk)
    # Sub-box refinement candidates (box bound only): K AABBs per block.
    sub_ks = [k for k in (2, 4, 8) if blk % k == 0 and blk // k >= 8]
    sub_bounds = {
        k: box_bounds(centers, radii, n_valid, blk // k) for k in sub_ks
    }
    cm2 = np.sum(centers * centers, axis=1) - radii * radii
    cm2[n_valid:] = 1.0e30  # padding rows never hit (pack_scene semantics)

    def bound_dist(p):
        """Front-to-back metric from point p, per the selected bound kind."""
        if args.bound == "box":
            return box_gap_dist(blo, bhi, p)
        return np.linalg.norm(ctr - p[None], axis=1) - rad

    # Production ordering: front-to-back from the camera center, static.
    cam_center = np.asarray(dc.center)
    order_cam = np.argsort(bound_dist(cam_center))

    ids = tiling.tiled_pixel_ids(w, h)
    n_tiles = ids.shape[0] // LANES
    tile_ids = list(range(n_tiles))
    if args.tiles:
        rng0 = np.random.default_rng(123)
        tile_ids = sorted(rng0.choice(n_tiles, size=args.tiles, replace=False))

    tot = {k: 0.0 for k in (
        "cam", "adapt", "oracle", "floor_tile", "floor_group", "floor_lane",
        "steps", "segments", "miss_forced", "bounce0", "miss_lanes")}
    for k in sub_ks:
        tot[f"cam_sub{k}"] = 0.0
        tot[f"floor_tile_sub{k}"] = 0.0
    t0 = time.time()
    for ti in tile_ids:
        lane_ids = ids[ti * LANES:(ti + 1) * LANES]
        valid = lane_ids < w * h
        px = (lane_ids % w).astype(np.float32)
        py = (lane_ids // w).astype(np.float32)
        rng = np.random.default_rng(args.seed * 100003 + ti)

        sample = np.where(valid, 0, args.spp)  # spill lanes start stale
        bounce = np.zeros(LANES, np.int32)
        o, d = camera_rays(dc, px, py, rng)

        while True:
            act = sample < args.spp
            if not act.any():
                break
            # Exact per-(lane, sphere) quadratic, packed-table semantics.
            a = np.sum(d * d, axis=1)                      # (L,)
            h_full = d @ centers.T - np.sum(d * o, axis=1)[:, None]
            cq = (cm2[None, :] - 2.0 * (o @ centers.T)
                  + np.sum(o * o, axis=1)[:, None])
            delta = h_full * h_full - a[:, None] * cq
            sq = np.sqrt(np.maximum(delta, 0.0))
            near = h_full - sq                              # n = a*t units
            far = h_full + sq
            ta = a * T_MIN
            root = np.where(near > ta[:, None], near, far)
            cand = np.where((delta >= 0.0) & (root > ta[:, None]),
                            root, np.inf).astype(np.float32)
            wn = cand.reshape(LANES, nb, blk).min(axis=2)   # (L, nb)

            # Gate quantities vs each block bound (margins dropped),
            # collapsed to the masked entry key (see masked_near).
            if args.bound == "box":
                near_b, far_b = box_slab(o, d, a, blo, bhi)
                nearg = masked_near(near_b, far_b, ta)
            else:
                h_b = d @ ctr.T - np.sum(d * o, axis=1)[:, None]
                cq_b = (bm2[None, :] - 2.0 * (o @ ctr.T)
                        + np.sum(o * o, axis=1)[:, None])
                delta_b = h_b * h_b - a[:, None] * cq_b
                sq_b = np.sqrt(np.maximum(delta_b, 0.0))
                with np.errstate(invalid="ignore"):
                    near_b = np.where(delta_b >= 0, h_b - sq_b, np.inf)
                    far_b = np.where(delta_b >= 0, h_b + sq_b, -np.inf)
                nearg = masked_near(near_b, far_b, ta)

            seg = int(act.sum())
            tot["segments"] += seg
            tot["steps"] += 1
            tot["cam"] += vote_sim(order_cam, act, nearg, wn)
            centroid = np.average(o, axis=0, weights=act.astype(np.float64))
            d_ad = bound_dist(centroid.astype(np.float32))
            tot["adapt"] += vote_sim(np.argsort(d_ad), act, nearg, wn)
            winner_blk = np.argmin(wn, axis=1)
            hit_any = np.isfinite(wn.min(axis=1)) & act
            counts = np.bincount(winner_blk[hit_any], minlength=nb)
            order_or = np.lexsort((d_ad, -counts))
            tot["oracle"] += vote_sim(order_or, act, nearg, wn)
            tot["floor_tile"] += floor_counts(act, nearg, wn, LANES)
            tot["floor_group"] += floor_counts(act, nearg, wn, 128)
            tot["floor_lane"] += floor_counts(act, nearg, wn, 1)
            if args.bound == "box":
                for k in sub_ks:
                    slo, shi, sne = sub_bounds[k]
                    near_f, far_f = box_slab(o, d, a, slo, shi)
                    ng = masked_near(near_f, far_f, ta)
                    ng = np.where(sne[None, :], ng, np.inf)
                    ng = ng.reshape(LANES, nb, k).min(axis=2)
                    tot[f"cam_sub{k}"] += vote_sim(order_cam, act, ng, wn)
                    tot[f"floor_tile_sub{k}"] += floor_counts(
                        act, ng, wn, LANES)
            # Mechanism decomposition: which floor-tile visits are forced
            # ONLY by miss lanes (final best = inf, i.e. a sky ray whose
            # bound can never tighten -- unavoidable at any ordering)?
            final = np.min(wn, axis=1)
            fpass = (act[:, None] & np.isfinite(nearg)
                     & (nearg <= final[:, None]))
            miss_lane = act & ~np.isfinite(final)
            forced = fpass.any(axis=0)
            hit_pass = (fpass & np.isfinite(final)[:, None]).any(axis=0)
            tot["miss_forced"] += int((forced & ~hit_pass).sum())
            tot["bounce0"] += int((act & (bounce == 0)).sum())
            tot["miss_lanes"] += int(miss_lane.sum())

            # Advance paths: exact closest hit -> scatter or end -> regen.
            t_hit = wn.min(axis=1) / np.maximum(a, 1e-30)
            idx = np.argmin(cand, axis=1)
            hit = np.isfinite(wn.min(axis=1))
            p = o + t_hit[:, None] * d
            cn = centers[idx]
            outward = (p - cn) / np.maximum(radii[idx], 1e-20)[:, None]
            front = np.sum(d * outward, axis=1) < 0.0
            normal = np.where(front[:, None], outward, -outward)
            uv = rng.standard_normal((LANES, 3)).astype(np.float32)
            uv /= np.maximum(np.linalg.norm(uv, axis=1, keepdims=True), 1e-12)
            nd, _, scat = _scatter(
                jnp.asarray(d), jnp.asarray(normal), jnp.asarray(front),
                jnp.asarray(kind[idx]), jnp.asarray(albedo[idx]),
                jnp.asarray(fuzz[idx]), jnp.asarray(ior[idx]),
                jnp.asarray(uv), jnp.asarray(rng.random(LANES, np.float32)),
            )
            nd = np.asarray(nd)
            scat = np.asarray(scat)

            cont = act & hit & scat & (bounce + 1 < args.depth)
            ends = act & ~cont
            o = np.where(cont[:, None], p, o)
            d = np.where(cont[:, None], nd, d)
            bounce = np.where(cont, bounce + 1, bounce)
            # Regen ended lanes on their next sample's camera ray.
            sample = np.where(ends, sample + 1, sample)
            re = ends & (sample < args.spp)
            if re.any():
                ro, rd = camera_rays(dc, px, py, rng)
                o = np.where(re[:, None], ro, o)
                d = np.where(re[:, None], rd, d)
                bounce = np.where(re, 0, bounce)

    segs = tot["segments"]
    steps = tot["steps"]
    print(f"scene stress:{args.n} bound={args.bound} "
          f"n_pad={n_pad} blocks={nb} blk={blk} "
          f"image {w}x{h} spp={args.spp} depth={args.depth} "
          f"tiles={len(tile_ids)}/{n_tiles} "
          f"segments={segs:.0f} steps={steps:.0f} ({time.time()-t0:.0f}s)")
    base = tot["cam"] / steps
    rows = [
        ("cam", "production static camera order"),
        ("adapt", "per-(tile,step) origin-centroid order"),
        ("oracle", "true-winner-count order (unimplementable)"),
        ("floor_tile", "ANY-order floor, tile vote"),
        ("floor_group", "floor at 128-lane group votes"),
        ("floor_lane", "floor at per-lane traversal"),
    ]
    for k in sub_ks:
        rows.append((f"cam_sub{k}", f"cam order, {k} sub-boxes/block gate"))
        rows.append((f"floor_tile_sub{k}",
                     f"ANY-order tile floor, {k} sub-boxes"))
    print(f"{'variant':<16}{'blocks/step':>12}{'vs cam':>9}   note")
    for k, note in rows:
        v = tot[k] / steps
        print(f"{k:<16}{v:>12.3f}{base / max(v, 1e-9):>8.2f}x   {note}")
    print(
        f"mechanism: {tot['miss_forced'] / steps:.3f} blocks/step of the "
        f"tile floor are forced ONLY by miss(sky) lanes; "
        f"{100 * tot['bounce0'] / max(segs, 1):.1f}% of segments are "
        f"primary (bounce 0); {100 * tot['miss_lanes'] / max(segs, 1):.1f}% "
        f"of segments end as misses"
    )


if __name__ == "__main__":
    main()

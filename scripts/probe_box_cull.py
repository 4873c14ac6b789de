"""Search a kill-shot for the AABB cull gate's axis-parallel hazard.

The box gate (RT_CULL=box) computes per-axis slab windows with a
sign-preserving reciprocal of d clamped away from zero. For a ray with
d_x == 0.0 EXACTLY whose origin sits just OUTSIDE a block's widened x-slab,
the geometric slab test says "never inside" -- but the sweep's f32
quadratic can still round a grazing TRUE-miss discriminant positive for a
sphere at the slab boundary (delta_true ~ -2*a*r*gap while the rounding
error is ~eps * |oc|^2 ~ 0.06 at |oc| = 1000), producing a winner the gate
must not cull. Only the PER-AXIS grazing margin (ds * |inv_axis|, huge on
the parallel axis) rescues this: a global margin or an unmargined slab test
culls the block and diverges.

This script finds a concrete (origin, direction) pair whose uniform
1024-ray tile exhibits the divergence when the margins are zeroed, for
hard-coding into test_pallas.py (same methodology as the round-3 sphere
kill-shot).

`--tri` runs the TRIANGLE analog (two-level path, 256-row blocks, edge-
aimed d_x=0 rays at a far small-triangle cluster). MEASURED RESULT: zero
rounding flips in 2048 edge-grazing candidates -- and none can exist in
this scenario class, by scale analysis: Moller-Trumbore's barycentric
rounding band is SPATIALLY ~3*eps*|oc| ~ 2e-7*|oc| (u_err ~ eps*|s||h|k
over dabs ~ |e|^2, times edge length |e| -- the |e| factors cancel, so the
band is edge-size-independent), while the pack-time box pad keeps a
coordinate-relative term 1e-6*max|coord| >= 1e-6*|oc|-ish: the pad beats
the flip band ~5x AT EVERY SCALE. The sphere quadratic has no such
protection (its flip band sqrt(eps)*|oc| ~ 7.7e-4*|oc| OUTRUNS the pad,
hence the sphere kill-shot and the _CULL_GRAZE_EPS margin). The triangle
gate still carries the same margins (defense in depth: they cost ~2 vector
ops per axis and also cover the approx-reciprocal key error regime) --
this record is why no triangle kill-shot test is pinned: none is
constructible in this class. test_mesh.py pins the hostile-regime scenario
as a plain A/B instead.

Run on CPU:

  PYTHONPATH=. JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/probe_box_cull.py
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

import raytracing_tpu.ops.pallas.trace as ptrace
from raytracing_tpu.scene.types import SceneBuilder


def build_scene(rng):
    C = np.array([0.0, 0.0, 1000.0])
    b = SceneBuilder()
    centers = []
    for _ in range(600):
        u = rng.normal(size=3)
        c = C + u / np.linalg.norm(u) * 0.4
        centers.append(c)
        b.add_metallic_sphere(tuple(c), 0.05, (0.9, 0.9, 0.9), 0.0)
    return b.build(), np.asarray(centers)


def run(scene, o, d, depth, env=None):
    env = env or {}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    jax.clear_caches()
    try:
        with pltpu.force_tpu_interpret_mode():
            rad, seg = ptrace.trace_rays_fused(
                scene, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
                jnp.int32(3), jnp.int32(0), depth,
            )
        return np.asarray(rad), int(seg)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        jax.clear_caches()


def build_tri_scene(rng):
    """600 small disconnected triangles (edge ~0.05) on a 0.4 shell at
    distance 1000 -> m_pad 1024, two-level triangle path, 256-row cull
    blocks. One far-behind sphere keeps the sphere table non-empty."""
    from raytracing_tpu.scene.types import MaterialKind

    C = np.array([0.0, 0.0, 1000.0])
    tris = []
    for _ in range(600):
        u = rng.normal(size=3)
        c = C + u / np.linalg.norm(u) * 0.4
        e1 = rng.normal(size=3)
        e1 *= 0.05 / np.linalg.norm(e1)
        e2 = rng.normal(size=3)
        e2 -= e1 * (e2 @ e1) / (e1 @ e1)
        e2 *= 0.05 / np.linalg.norm(e2)
        tris.append((c, c + e1, c + e2))
    verts = np.asarray(tris, np.float32).reshape(-1, 3)
    faces = np.arange(len(tris) * 3, dtype=np.int32).reshape(-1, 3)
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, 0.0, -50.0), 1.0, (0.9, 0.9, 0.9), 0.0)
    b.add_mesh(verts, faces, albedo=(0.9, 0.9, 0.9),
               kind=MaterialKind.METALLIC, fuzz=0.0)
    return b.build(), np.asarray(tris)


def tri_mode(rng):
    scene, tris = build_tri_scene(rng)
    tri_table, tri_m = ptrace.pack_triangles(scene)
    m_pad = tri_table.shape[0]
    blk = ptrace._tri_blk(m_pad)
    _, bnd = ptrace._tri_block_bounds(
        tri_table[:, 0:3], tri_table[:, 3:6], tri_table[:, 6:9],
        tri_m, blk, jnp.zeros((3,), jnp.float32), "box",
    )
    bnd = np.asarray(bnd).reshape(-1, 8)
    hix = bnd[bnd[:, 7] > 0.5, 3].max()
    X0 = np.float32(hix + 2.0e-4)
    print(f"m_pad={m_pad} blk={blk} blocks={len(bnd)} hix={hix!r} X0={X0!r}")

    # Aim at EDGE MIDPOINTS of the most positive-x triangles with d_x = 0:
    # Moller-Trumbore's scaled barycentric tests round across their bounds
    # at |oc| ~ 1000, flipping grazing TRUE misses into hits.
    vmax = tris.max(axis=1)[:, 0]
    order = np.argsort(-vmax)
    dirs = []
    for ti in order[:8]:
        a3, b3, c3 = tris[ti]
        for pair in ((a3, b3), (a3, c3), (b3, c3)):
            mid = 0.5 * (pair[0] + pair[1])
            for _ in range(96):
                aim = mid + rng.normal(size=3) * 5.0e-3
                dyz = aim[1:]
                dyz = dyz / np.linalg.norm(dyz)
                dirs.append([0.0, dyz[0], dyz[1]])
    d = np.asarray(dirs, np.float32)
    d[:, 0] = 0.0
    n_rays = (len(d) // 1024) * 1024
    d = d[:n_rays]
    o = np.tile(np.array([X0, 0.0, 0.0], np.float32), (n_rays, 1))

    rad, _ = run(scene, o, d, 1, env={"RT_CULL": "0"})
    hit = (rad == 0.0).all(axis=1)
    print(f"grazing hits found: {hit.sum()} / {n_rays}")
    if not hit.any():
        # EXPECTED healthy outcome (see module docstring): M-T's rounding
        # band sits ~5x under the pack-time pad at every scale, so no
        # triangle kill-shot is constructible in this class. A future hit
        # means that analysis went stale -- the confirmation flow below
        # then checks the margins still hold.
        print("confirmed: no triangle kill-shot constructible (expected)")
        return 0
    print("UNEXPECTED: candidates found -- the probe docstring's "
          "no-kill-shot analysis is stale; confirming margins hold anyway")
    kill = d[np.nonzero(hit)[0][0]]
    print("kill direction:", repr(kill.tolist()), "origin X0:", repr(float(X0)))

    du = np.tile(kill, (1024, 1)).astype(np.float32)
    ou = np.tile(np.array([X0, 0.0, 0.0], np.float32), (1024, 1))
    rad_ref, seg_ref = run(scene, ou, du, 3, env={"RT_CULL": "0"})
    rad_box, seg_box = run(scene, ou, du, 3, env={"RT_CULL": "box"})
    ok_shipped = seg_ref == seg_box and np.array_equal(rad_ref, rad_box)
    print(f"shipped margins byte-equal: {ok_shipped} (seg {seg_ref} vs {seg_box})")

    g, s = ptrace._CULL_GRAZE_EPS, ptrace._CULL_SLAB_EPS
    ptrace._CULL_GRAZE_EPS = 0.0
    ptrace._CULL_SLAB_EPS = 0.0
    try:
        rad_z, seg_z = run(scene, ou, du, 3, env={"RT_CULL": "box"})
    finally:
        ptrace._CULL_GRAZE_EPS, ptrace._CULL_SLAB_EPS = g, s
    diverged = seg_z != seg_ref or not np.array_equal(rad_z, rad_ref)
    print(f"zeroed margins diverge: {diverged} (seg {seg_z} vs {seg_ref})")
    return 0 if (ok_shipped and diverged) else 1


def main():
    import sys

    rng = np.random.default_rng(5)
    if "--tri" in sys.argv:
        return tri_mode(rng)
    scene, centers = build_scene(rng)

    # The widened x-slab upper edge over ALL cull blocks, via the real
    # pack-side bounds.
    geh, gec, shade, n = ptrace.pack_scene(scene)[:4]
    n_pad = geh.shape[0]
    blk = min(n_pad, ptrace._SWEEP_ROWS)
    _, bnd = ptrace._block_bounds(
        np.asarray(geh[:, :3]), np.asarray(shade[:, 3]), n, blk,
        jnp.zeros((3,), jnp.float32), "box",
    )
    bnd = np.asarray(bnd).reshape(-1, 8)
    hix = bnd[bnd[:, 7] > 0.5, 3].max()
    X0 = np.float32(hix + 2.0e-4)
    print(f"n_pad={n_pad} blocks={len(bnd)} widened hix={hix!r} X0={X0!r}")

    # Candidates: d_x = 0 exactly, aimed at the yz-projection of the most
    # positive-x spheres (impact parameter == X0 - c_x, just above r).
    order = np.argsort(-centers[:, 0])
    cand_c = centers[order[:8]]
    dirs = []
    for c in cand_c:
        for _ in range(256):
            dyz = c[1:] + rng.normal(size=2) * 3.0e-3
            dyz /= np.linalg.norm(dyz)
            dirs.append([0.0, dyz[0], dyz[1]])
    d = np.asarray(dirs, np.float32)
    d[:, 0] = 0.0
    n_rays = (len(d) // 1024) * 1024
    d = d[:n_rays]
    o = np.tile(np.array([X0, 0.0, 0.0], np.float32), (n_rays, 1))

    # depth=1: a lane that hits anything returns BLACK (depth exhausted);
    # a miss returns the sky gradient (never black). RT_CULL=0 so no gate
    # can hide the rounded hits.
    rad, _ = run(scene, o, d, 1, env={"RT_CULL": "0"})
    hit = (rad == 0.0).all(axis=1)
    print(f"spurious/grazing hits found: {hit.sum()} / {n_rays}")
    if not hit.any():
        print("NO kill-shot candidate; widen the search")
        return 1

    kill = d[np.nonzero(hit)[0][0]]
    print("kill direction:", repr(kill.tolist()), "origin X0:", repr(float(X0)))

    # Confirm on a uniform 1024-ray tile: shipped box margins byte-equal,
    # zeroed margins diverge.
    du = np.tile(kill, (1024, 1)).astype(np.float32)
    ou = np.tile(np.array([X0, 0.0, 0.0], np.float32), (1024, 1))
    rad_ref, seg_ref = run(scene, ou, du, 3, env={"RT_CULL": "0"})
    rad_box, seg_box = run(scene, ou, du, 3, env={"RT_CULL": "box"})
    ok_shipped = seg_ref == seg_box and np.array_equal(rad_ref, rad_box)
    print(f"shipped margins byte-equal: {ok_shipped} (seg {seg_ref} vs {seg_box})")

    g, s = ptrace._CULL_GRAZE_EPS, ptrace._CULL_SLAB_EPS
    ptrace._CULL_GRAZE_EPS = 0.0
    ptrace._CULL_SLAB_EPS = 0.0
    try:
        rad_z, seg_z = run(scene, ou, du, 3, env={"RT_CULL": "box"})
    finally:
        ptrace._CULL_GRAZE_EPS, ptrace._CULL_SLAB_EPS = g, s
    diverged = seg_z != seg_ref or not np.array_equal(rad_z, rad_ref)
    print(f"zeroed margins diverge: {diverged} (seg {seg_z} vs {seg_ref})")
    return 0 if (ok_shipped and diverged) else 1


if __name__ == "__main__":
    raise SystemExit(main())

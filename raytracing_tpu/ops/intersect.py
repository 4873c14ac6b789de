"""Ray-scene intersection: closest hit over all spheres as one min-reduction.

TPU-native replacement for the reference's per-object virtual dispatch scan
(``/root/reference/src/ray.tracer.object.defs.cc``):

- ``HittableObject_Sphere::intersects`` (``object.defs.cc:41-66``): analytic
  quadratic with the half-b formulation (a = d.d, h = d.oc, c = oc.oc - r^2,
  delta = h^2 - a c) and near-root-then-far-root selection against an open
  t-interval (``Interval::surrounds``, strict inequalities).
- ``HittableObject_Collection::intersects`` (``object.defs.cc:68-81``): linear
  closest-hit scan with a shrinking [t_min, closest) interval. A global
  "validate both roots against [t_min, t_max), take the per-sphere candidate,
  then argmin over spheres" computes the identical closest hit without the
  sequential dependency (proof sketch: the shrinking upper bound only ever
  discards candidates that lose the min anyway, and per-sphere root selection
  against a tighter upper bound can only move a sphere's candidate from its
  near root to its far root, which also loses the min).
- ``IntersectionRecord`` front-face normal flip (``object.defs.cc:11-18``):
  computed in :func:`hit_records`.

Two formulation choices, selectable for benchmarking:
  * ``_dots_matmul``: computes the per-(ray, sphere) dot products d.c and o.c
    with one (B, 6) @ (6, 2N) matmul so the MXU does the O(B N) contraction
    work and XLA fuses the remaining elementwise ops into its epilogue.
  * ``_dots_broadcast``: pure VPU broadcast version (useful on CPU/testing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as rmath
from ..scene.types import Scene

_F32_INF = jnp.float32(jnp.inf)


def _dots_matmul(o: jnp.ndarray, d: jnp.ndarray, centers: jnp.ndarray):
    """(d.c_j, o.c_j) for all rays x spheres via a single MXU contraction.

    Builds X = [d | o] (B, 6) and W (6, 2N) with W[:3, :N] = C^T and
    W[3:, N:] = C^T, giving X @ W = [d.C^T | o.C^T].
    """
    n = centers.shape[0]
    x = jnp.concatenate([d, o], axis=-1)  # (B, 6)
    w = jnp.zeros((6, 2 * n), centers.dtype)
    w = w.at[0:3, 0:n].set(centers.T)
    w = w.at[3:6, n : 2 * n].set(centers.T)
    # Precision.HIGHEST is required: the default lets the backend multiply in
    # bfloat16 (~1e-3 relative error), which corrupts the delta = h^2 - a*c
    # cancellation enough to flip hit/miss decisions on real scenes.
    prod = jnp.dot(
        x, w, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )  # (B, 2N)
    return prod[:, :n], prod[:, n:]


def _dots_broadcast(o: jnp.ndarray, d: jnp.ndarray, centers: jnp.ndarray):
    hi = jax.lax.Precision.HIGHEST
    d_dot_c = jnp.einsum("bk,nk->bn", d, centers, precision=hi)
    o_dot_c = jnp.einsum("bk,nk->bn", o, centers, precision=hi)
    return d_dot_c, o_dot_c


def intersect_scene(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    scene: Scene,
    t_min: float = rmath.T_MIN,
    t_max: float = rmath.T_MAX,
    *,
    use_matmul: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest hit of each ray against every sphere in the scene.

    Args:
      origins, directions: ``(B, 3)`` float32 (directions need not be unit).
      scene: SoA sphere world.
      t_min, t_max: open hit interval, default ``(1e-4, inf)`` matching
        ``ray.tracer.core.cc:243``.

    Returns:
      ``(t, index, hit)``: per-ray closest hit distance (``inf`` on miss),
      the index of the hit sphere (0 on miss -- gate on ``hit``), and the
      boolean hit mask.
    """
    n = scene.num_objects
    b = origins.shape[0]
    if n == 0:
        return (
            jnp.full((b,), _F32_INF),
            jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), bool),
        )

    dots = _dots_matmul if use_matmul else _dots_broadcast
    d_dot_c, o_dot_c = dots(origins, directions, scene.centers)  # (B, N) each

    a = jnp.sum(directions * directions, axis=-1, keepdims=True)  # (B, 1)
    d_dot_o = jnp.sum(directions * origins, axis=-1, keepdims=True)
    o_dot_o = jnp.sum(origins * origins, axis=-1, keepdims=True)
    c_dot_c = jnp.sum(scene.centers * scene.centers, axis=-1)  # (N,)

    # oc = center - origin (object.defs.cc:43):
    #   h = d.oc = d.c - d.o            (object.defs.cc:45)
    #   c = oc.oc - r^2                 (object.defs.cc:46)
    h = d_dot_c - d_dot_o
    c = c_dot_c[None, :] - 2.0 * o_dot_c + o_dot_o - scene.radii[None, :] ** 2
    delta = h * h - a * c  # (B, N)            (object.defs.cc:48)

    sqrtd = jnp.sqrt(jnp.maximum(delta, 0.0))
    inv_a = 1.0 / a
    root_near = (h - sqrtd) * inv_a  # (object.defs.cc:54)
    root_far = (h + sqrtd) * inv_a   # (object.defs.cc:56)

    def _surrounds(t):  # strict, == Interval::surrounds (interval.hpp:14)
        return (t > t_min) & (t < t_max)

    near_ok = _surrounds(root_near)
    far_ok = _surrounds(root_far)
    root = jnp.where(near_ok, root_near, root_far)
    valid = (delta >= 0.0) & (near_ok | far_ok)

    t_candidates = jnp.where(valid, root, _F32_INF)
    index = jnp.argmin(t_candidates, axis=-1).astype(jnp.int32)
    t = jnp.min(t_candidates, axis=-1)
    hit = t < _F32_INF
    return t, index, hit


# ---------------------------------------------------------------------------
# Triangles: Moller-Trumbore, brute min-reduction or stackless BVH traversal
# ---------------------------------------------------------------------------

# Parallel-ray guard for the Moller-Trumbore determinant. Rays exactly in a
# triangle's plane are a measure-zero miss either way.
_MT_EPS = 1.0e-12


def _mt_candidates(o, d, v0, e1, e2, t_min, t_max):
    """Moller-Trumbore over a (B, M) ray x triangle block -> candidate t
    ((B, M), inf where no hit). Two-sided (front-face handled by the normal
    flip in triangle_hit_records, matching the sphere path's convention)."""
    # h = d x e2; det = e1 . h     (per ray x tri: broadcast (B,1,3)x(M,3))
    db = d[:, None, :]
    hx = db[..., 1] * e2[None, :, 2] - db[..., 2] * e2[None, :, 1]
    hy = db[..., 2] * e2[None, :, 0] - db[..., 0] * e2[None, :, 2]
    hz = db[..., 0] * e2[None, :, 1] - db[..., 1] * e2[None, :, 0]
    det = e1[None, :, 0] * hx + e1[None, :, 1] * hy + e1[None, :, 2] * hz
    inv = 1.0 / jnp.where(jnp.abs(det) > _MT_EPS, det, 1.0)
    sx = o[:, None, 0] - v0[None, :, 0]
    sy = o[:, None, 1] - v0[None, :, 1]
    sz = o[:, None, 2] - v0[None, :, 2]
    u = (sx * hx + sy * hy + sz * hz) * inv
    # q = s x e1
    qx = sy * e1[None, :, 2] - sz * e1[None, :, 1]
    qy = sz * e1[None, :, 0] - sx * e1[None, :, 2]
    qz = sx * e1[None, :, 1] - sy * e1[None, :, 0]
    v = (db[..., 0] * qx + db[..., 1] * qy + db[..., 2] * qz) * inv
    t = (e2[None, :, 0] * qx + e2[None, :, 1] * qy + e2[None, :, 2] * qz) * inv
    ok = (
        (jnp.abs(det) > _MT_EPS)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min) & (t < t_max)
    )
    return jnp.where(ok, t, _F32_INF)


def intersect_triangles(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    scene: Scene,
    t_min: float = rmath.T_MIN,
    t_max: float = rmath.T_MAX,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Brute closest hit over all M triangles (masked min-reduction -- the
    triangle analog of intersect_scene; the oracle the BVH is tested
    against)."""
    b = origins.shape[0]
    if scene.num_triangles == 0:
        return (
            jnp.full((b,), _F32_INF),
            jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), bool),
        )
    cand = _mt_candidates(
        origins, directions, scene.tri_v0, scene.tri_e1, scene.tri_e2,
        t_min, t_max,
    )
    idx = jnp.argmin(cand, axis=-1).astype(jnp.int32)
    t = jnp.min(cand, axis=-1)
    return t, idx, t < _F32_INF


def intersect_triangles_bvh(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    scene: Scene,
    t_min: float = rmath.T_MIN,
    t_max: float = rmath.T_MAX,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest triangle hit via the flattened skip-link BVH (scene/mesh.py).

    Stackless per-ray traversal as ONE ``lax.while_loop`` over the whole ray
    batch: each ray carries its own node cursor; on an AABB hit the cursor
    advances depth-first (+1), on a miss it jumps the subtree (skip link).
    Leaves test their <= LEAF_SIZE triangles with static unrolling. The loop
    runs until every cursor walks off the end -- rays that finish early idle
    (masked) rather than diverge, the TPU-friendly shape.
    """
    b = origins.shape[0]
    if scene.num_triangles == 0:
        return (
            jnp.full((b,), _F32_INF),
            jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), bool),
        )
    from ..scene.mesh import LEAF_SIZE

    k = scene.bvh_min.shape[0]
    inv_d = 1.0 / jnp.where(
        jnp.abs(directions) > 1e-30, directions, 1e-30
    )  # (B, 3); slab test below is robust to the sign either way

    def cond(state):
        node, _, _ = state
        return jnp.any(node < k)

    def body(state):
        node, best_t, best_i = state
        node_c = jnp.minimum(node, k - 1)
        bmin = scene.bvh_min[node_c]  # (B, 3) gather
        bmax = scene.bvh_max[node_c]
        t0 = (bmin - origins) * inv_d
        t1 = (bmax - origins) * inv_d
        tlo = jnp.minimum(t0, t1)
        thi = jnp.maximum(t0, t1)
        enter = jnp.maximum(jnp.max(tlo, axis=-1), t_min)
        exit_ = jnp.minimum(jnp.min(thi, axis=-1), jnp.minimum(best_t, t_max))
        live = node < k
        box_hit = live & (enter <= exit_)

        count = scene.bvh_count[node_c]
        first = scene.bvh_first[node_c]
        is_leaf = box_hit & (count > 0)
        # Per-ray, per-leaf-slot triangle test (each ray tests ITS OWN
        # leaf's triangles): static unroll over the leaf capacity, inline
        # Moller-Trumbore on gathered (B, 3) rows; lanes at non-leaves or
        # short leaves are masked out.
        for j in range(LEAF_SIZE):
            ti = jnp.minimum(
                first + j, jnp.int32(max(scene.num_triangles - 1, 0))
            )
            v0 = scene.tri_v0[ti]
            e1 = scene.tri_e1[ti]
            e2 = scene.tri_e2[ti]
            h = jnp.cross(directions, e2)
            det = jnp.sum(e1 * h, axis=-1)
            inv = 1.0 / jnp.where(jnp.abs(det) > _MT_EPS, det, 1.0)
            s = origins - v0
            u = jnp.sum(s * h, axis=-1) * inv
            q = jnp.cross(s, e1)
            v = jnp.sum(directions * q, axis=-1) * inv
            t = jnp.sum(e2 * q, axis=-1) * inv
            ok = (
                is_leaf & (j < count)
                & (jnp.abs(det) > _MT_EPS)
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > t_min) & (t < jnp.minimum(best_t, t_max))
            )
            best_i = jnp.where(ok, ti, best_i)
            best_t = jnp.where(ok, t, best_t)

        node = jnp.where(box_hit, node + 1, scene.bvh_skip[node_c])
        node = jnp.where(live, node, node_c + k)  # park finished lanes
        return node, best_t, best_i

    node0 = jnp.zeros((b,), jnp.int32)
    best_t0 = jnp.full((b,), _F32_INF)
    best_i0 = jnp.zeros((b,), jnp.int32)
    _, t, idx = jax.lax.while_loop(cond, body, (node0, best_t0, best_i0))
    return t, idx, t < _F32_INF


def triangle_hit_records(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t: jnp.ndarray,
    index: jnp.ndarray,
    scene: Scene,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hit point + front-face-corrected unit geometric normal (two-sided
    triangles, same flip convention as spheres / object.defs.cc:11-18)."""
    t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
    p = rmath.point_at_param(origins, directions, t_safe)
    e1 = scene.tri_e1[index]
    e2 = scene.tri_e2[index]
    outward = rmath.normalize(jnp.cross(e1, e2), eps=1.0e-30)
    front = rmath.dot(directions, outward) < 0.0
    normal = jnp.where(front[..., None], outward, -outward)
    return p, normal, front


def hit_records(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t: jnp.ndarray,
    index: jnp.ndarray,
    scene: Scene,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hit point + front-face-corrected unit normal for each ray.

    Parity: ``IntersectionRecord`` construction (``object.defs.cc:11-18``,
    ``62-65``): ``p = r.at(t)``, ``outward = (p - center) / radius``,
    ``front = dot(dir, outward) < 0``, normal flipped to oppose the ray.
    Only meaningful where ``hit`` is true (garbage-but-finite elsewhere; the
    caller masks). ``t`` is clamped to a finite value so missed lanes do not
    produce inf/NaN that could leak through masked arithmetic.

    Returns:
      ``(p, normal, front_face)`` with shapes ``(B,3), (B,3), (B,)``.
    """
    t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
    p = rmath.point_at_param(origins, directions, t_safe)
    center = scene.centers[index]  # (B, 3) gather
    radius = scene.radii[index]
    outward = (p - center) / radius[..., None]
    front = rmath.dot(directions, outward) < 0.0
    normal = jnp.where(front[..., None], outward, -outward)
    return p, normal, front

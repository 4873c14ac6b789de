"""Ray-sphere intersection vs closed forms, matching the semantics of
HittableObject_Sphere::intersects (object.defs.cc:41-66) and the closest-hit
collection scan (object.defs.cc:68-81)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tpu.ops import intersect as ri
from raytracing_tpu.scene.types import SceneBuilder


def _scene(*spheres):
    b = SceneBuilder()
    for center, radius in spheres:
        b.add_lambertian_sphere(center, radius, (1.0, 1.0, 1.0))
    return b.build()


@pytest.mark.parametrize("use_matmul", [True, False])
def test_head_on_hit(use_matmul):
    scene = _scene(((0.0, 0.0, -2.0), 0.5))
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, idx, hit = ri.intersect_scene(o, d, scene, use_matmul=use_matmul)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.5, atol=1e-6)
    p, n, front = ri.hit_records(o, d, t, idx, scene)
    np.testing.assert_allclose(np.asarray(p)[0], [0, 0, -1.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n)[0], [0, 0, 1.0], atol=1e-6)
    assert bool(front[0])


def test_unnormalized_direction_scales_t():
    # t is in units of |d|: direction length 2 halves t (a = d.d in the quadratic).
    scene = _scene(((0.0, 0.0, -2.0), 0.5))
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -2.0]])
    t, _, hit = ri.intersect_scene(o, d, scene)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 0.75, atol=1e-6)


def test_miss():
    scene = _scene(((0.0, 0.0, -2.0), 0.5))
    o = jnp.array([[0.0, 2.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, _, hit = ri.intersect_scene(o, d, scene)
    assert not bool(hit[0])
    assert np.isinf(float(t[0]))


def test_inside_sphere_takes_far_root_back_face():
    # Origin at the center: near root is negative -> far root t = r; the
    # outward normal at the exit point is flipped (front_face False)
    # (object.defs.cc:54-58, 11-18).
    scene = _scene(((0.0, 0.0, 0.0), 2.0))
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, idx, hit = ri.intersect_scene(o, d, scene)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-6)
    p, n, front = ri.hit_records(o, d, t, idx, scene)
    assert not bool(front[0])
    np.testing.assert_allclose(np.asarray(n)[0], [0, 0, 1.0], atol=1e-6)  # flipped


def test_closest_of_two():
    scene = _scene(((0.0, 0.0, -5.0), 0.5), ((0.0, 0.0, -3.0), 0.5))
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, idx, hit = ri.intersect_scene(o, d, scene)
    assert bool(hit[0])
    assert int(idx[0]) == 1
    np.testing.assert_allclose(float(t[0]), 2.5, atol=1e-6)


def test_t_min_skips_self_intersection():
    # Ray starting exactly on the surface, leaving: near root ~0 is rejected
    # by the open interval (t_min=1e-4), far root is behind -> miss.
    scene = _scene(((0.0, 0.0, -2.0), 0.5))
    o = jnp.array([[0.0, 0.0, -1.5]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, _, hit = ri.intersect_scene(o, d, scene)
    assert not bool(hit[0])


def test_t_max_clips():
    scene = _scene(((0.0, 0.0, -5.0), 0.5))
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    _, _, hit = ri.intersect_scene(o, d, scene, t_max=4.0)
    assert not bool(hit[0])
    _, _, hit2 = ri.intersect_scene(o, d, scene, t_max=5.0)
    assert bool(hit2[0])


def test_tangent_grazing_ray():
    # delta == 0 tangent: root at the tangent point if within the interval.
    scene = _scene(((0.0, 0.0, -2.0), 1.0))
    o = jnp.array([[1.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, _, hit = ri.intersect_scene(o, d, scene)
    # f32 roundoff can push delta slightly negative; accept hit-at-2 or miss.
    if bool(hit[0]):
        np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-3)


def test_empty_scene_misses():
    scene = SceneBuilder().build()
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
    t, idx, hit = ri.intersect_scene(o, d, scene)
    assert not np.asarray(hit).any()


@pytest.mark.parametrize("use_matmul", [True, False])
def test_matmul_and_broadcast_agree_random(use_matmul):
    rng = np.random.default_rng(5)
    b = SceneBuilder()
    for _ in range(37):
        b.add_lambertian_sphere(rng.normal(size=3) * 3, rng.uniform(0.2, 1.0), (1, 1, 1))
    scene = b.build()
    o = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32) * 4)
    d = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    t1, i1, h1 = ri.intersect_scene(o, d, scene, use_matmul=True)
    t2, i2, h2 = ri.intersect_scene(o, d, scene, use_matmul=False)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_allclose(
        np.where(np.asarray(h1), np.asarray(t1), 0),
        np.where(np.asarray(h2), np.asarray(t2), 0),
        rtol=2e-5, atol=2e-5,
    )


def test_brute_force_reference_scan():
    """Cross-check the vectorized closest-hit against a literal port of the
    reference's sequential shrinking-interval loop (object.defs.cc:68-81)."""
    rng = np.random.default_rng(11)
    centers = (rng.normal(size=(25, 3)) * 3).astype(np.float32)
    radii = rng.uniform(0.3, 1.2, size=25).astype(np.float32)
    b = SceneBuilder()
    for c, r in zip(centers, radii):
        b.add_lambertian_sphere(c, r, (1, 1, 1))
    scene = b.build()

    o_np = (rng.normal(size=(64, 3)) * 4).astype(np.float32)
    d_np = rng.normal(size=(64, 3)).astype(np.float32)

    def scan_one(o, d):
        t_min, closest = 1e-4, np.inf
        best = None
        for j in range(len(radii)):
            oc = centers[j] - o
            a = d @ d
            h = d @ oc
            c = oc @ oc - radii[j] ** 2
            delta = h * h - a * c
            if delta < 0:
                continue
            sq = np.sqrt(delta)
            root = (h - sq) / a
            if not (t_min < root < closest):
                root = (h + sq) / a
                if not (t_min < root < closest):
                    continue
            closest, best = root, j
        return closest if best is not None else np.inf, best

    t, idx, hit = ri.intersect_scene(jnp.asarray(o_np), jnp.asarray(d_np), scene)
    t, idx, hit = np.asarray(t), np.asarray(idx), np.asarray(hit)
    def _grazing(i, j):
        # Closest-approach margin of ray i to sphere j: near-tangent rays may
        # legitimately differ between f32 and the f64 reference scan.
        o64, d64 = o_np[i].astype(np.float64), d_np[i].astype(np.float64)
        oc = centers[j].astype(np.float64) - o64
        a = d64 @ d64
        h = d64 @ oc
        delta = h * h - a * (oc @ oc - float(radii[j]) ** 2)
        return abs(delta) < 1e-2 * a

    for i in range(64):
        t_ref, j_ref = scan_one(o_np[i].astype(np.float64), d_np[i].astype(np.float64))
        if hit[i] != (j_ref is not None):
            j_any = int(idx[i]) if hit[i] else j_ref
            assert _grazing(i, j_any), (i, t[i], t_ref, j_ref)
            continue
        if j_ref is not None:
            if idx[i] != j_ref:
                assert _grazing(i, j_ref) or _grazing(i, int(idx[i])), (i, idx[i], j_ref)
                continue
            np.testing.assert_allclose(t[i], t_ref, rtol=1e-4, atol=1e-5)

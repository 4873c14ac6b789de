"""Wavefront integrator semantics vs the reference recursion
(compute_color, ray.tracer.core.cc:236-257), including a distributional
golden test against a literal numpy port of the reference algorithm."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from raytracing_tpu.core import rng as rrng
from raytracing_tpu.models import integrator
from raytracing_tpu.scene.types import MaterialKind, SceneBuilder


def _keys(n, seed=0):
    return rrng.ray_keys(jr.key(seed), jnp.arange(n, dtype=jnp.int32))


def test_sky_only_exact_gradient():
    """Empty world: radiance is exactly the vertical lerp (core.cc:254-256)."""
    scene = SceneBuilder().build()
    d = jnp.array(
        [[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [3.0, 4.0, 0.0]],
        jnp.float32,
    )
    o = jnp.zeros_like(d)
    rad, segments = integrator.trace_rays(scene, o, d, _keys(4), max_depth=8)
    rad = np.asarray(rad)
    np.testing.assert_allclose(rad[0], [0.5, 0.7, 1.0], atol=1e-6)   # t=1
    np.testing.assert_allclose(rad[1], [1.0, 1.0, 1.0], atol=1e-6)   # t=0
    np.testing.assert_allclose(rad[2], [0.75, 0.85, 1.0], atol=1e-6) # t=0.5
    ty = 0.5 * (4.0 / 5.0 + 1.0)  # unnormalized dir normalized first
    np.testing.assert_allclose(
        rad[3], (1 - ty) * np.ones(3) + ty * np.array([0.5, 0.7, 1.0]), atol=1e-6
    )
    assert int(segments) == 4  # every ray traced exactly one segment


def test_max_depth_zero_is_black():
    """depth == 0 -> vec3{0} before anything else (core.cc:238-240)."""
    scene = SceneBuilder().build()
    d = jnp.array([[0.0, 1.0, 0.0]], jnp.float32)
    rad, segments = integrator.trace_rays(
        scene, jnp.zeros_like(d), d, _keys(1), max_depth=0
    )
    np.testing.assert_array_equal(np.asarray(rad), [[0.0, 0.0, 0.0]])
    assert int(segments) == 0


def test_enclosed_black_hole_terminates_at_depth():
    """Camera inside a zero-albedo lambertian shell: rays never escape, so
    radiance is 0 and exactly max_depth segments are traced per ray."""
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, 0.0, 0.0), 10.0, (0.0, 0.0, 0.0))
    scene = b.build()
    n, depth = 16, 5
    d = rrng.unit_vector(_keys(n, seed=9))
    rad, segments = integrator.trace_rays(
        scene, jnp.zeros((n, 3), jnp.float32), d, _keys(n), max_depth=depth
    )
    np.testing.assert_allclose(np.asarray(rad), 0.0, atol=0)
    assert int(segments) == n * depth


def test_determinism_same_keys_same_radiance():
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5))
    b.add_metallic_sphere((0.0, 0.0, -1.0), 0.5, (0.8, 0.6, 0.2), 0.1)
    scene = b.build()
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (64, 1))
    o = jnp.zeros_like(d)
    r1, _ = integrator.trace_rays(scene, o, d, _keys(64, seed=5), max_depth=8)
    r2, _ = integrator.trace_rays(scene, o, d, _keys(64, seed=5), max_depth=8)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_radiance_nonnegative_and_bounded():
    """Attenuations are all <= 1 and the sky is <= 1, so radiance in [0, 1]."""
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5))
    b.add_dielectric_sphere((0.0, 0.0, -1.0), 0.5, 1.5)
    b.add_metallic_sphere((1.0, 0.0, -1.5), 0.5, (0.9, 0.9, 0.9), 0.3)
    scene = b.build()
    n = 512
    d = rrng.unit_vector(_keys(n, seed=2))
    rad, _ = integrator.trace_rays(
        scene, jnp.zeros((n, 3), jnp.float32), d, _keys(n, seed=3), max_depth=16
    )
    rad = np.asarray(rad)
    assert (rad >= 0.0).all()
    assert (rad <= 1.0 + 1e-5).all()
    assert np.isfinite(rad).all()


# --- distributional golden test vs a numpy port of the reference ------------


def _numpy_reference_trace(scene_np, o, d, depth, rng):
    """Literal port of compute_color (core.cc:236-257) + the three scatters
    (material.defs.cc:31-87), in float64 numpy with python-side RNG."""
    centers, radii, kinds, albedo, fuzz, ior = scene_np

    def rand_unit():
        while True:
            p = rng.uniform(-1, 1, 3)
            l2 = p @ p
            if 1e-30 < l2 <= 1.0:
                return p / np.sqrt(l2)

    def hit_world(o, d):
        t_best, j_best = np.inf, None
        for j in range(len(radii)):
            oc = centers[j] - o
            a = d @ d
            h = d @ oc
            c = oc @ oc - radii[j] ** 2
            delta = h * h - a * c
            if delta < 0:
                continue
            sq = np.sqrt(delta)
            for root in ((h - sq) / a, (h + sq) / a):
                if 1e-4 < root < t_best:
                    t_best, j_best = root, j
                    break
        return t_best, j_best

    color = np.ones(3)
    for _ in range(depth):
        t, j = hit_world(o, d)
        if j is None:
            u = d / np.linalg.norm(d)
            s = 0.5 * (u[1] + 1.0)
            return color * ((1 - s) * np.ones(3) + s * np.array([0.5, 0.7, 1.0]))
        p = o + t * d
        outward = (p - centers[j]) / radii[j]
        front = d @ outward < 0
        n = outward if front else -outward
        if kinds[j] == int(MaterialKind.LAMBERTIAN):
            nd = n + rand_unit()
            if np.all(np.abs(nd) < 1e-8):
                nd = n
            color = color * albedo[j]
        elif kinds[j] == int(MaterialKind.METALLIC):
            refl = d - 2 * (d @ n) * n
            nd = refl / np.linalg.norm(refl) + fuzz[j] * rand_unit()
            if nd @ n <= 0:
                return np.zeros(3)
            color = color * albedo[j]
        else:
            eta = 1.0 / ior[j] if front else ior[j]
            u = d / np.linalg.norm(d)
            cos_t = min(-u @ n, 1.0)
            sin_t = np.sqrt(1 - cos_t**2)
            r0 = ((1 - eta) / (1 + eta)) ** 2
            schlick = r0 + (1 - r0) * (1 - cos_t) ** 5
            if eta * sin_t > 1.0 or schlick > rng.uniform():
                nd = u - 2 * (u @ n) * n
            else:
                perp = eta * (u + cos_t * n)
                nd = perp - np.sqrt(abs(1 - perp @ perp)) * n
        o, d = p, nd
    return np.zeros(3)


@pytest.mark.slow
def test_distributional_parity_with_reference_port():
    """Mean radiance from the wavefront integrator matches a direct numpy port
    of the reference recursion within Monte-Carlo error (RNGs differ, so the
    comparison is distributional -- SURVEY.md section 7 item 3)."""
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5))
    b.add_lambertian_sphere((0.0, 0.0, -1.0), 0.5, (0.7, 0.3, 0.3))
    b.add_metallic_sphere((1.0, 0.0, -1.0), 0.5, (0.8, 0.8, 0.8), 0.1)
    b.add_dielectric_sphere((-1.0, 0.0, -1.0), 0.5, 1.5)
    scene = b.build()
    scene_np = (
        np.asarray(scene.centers, np.float64),
        np.asarray(scene.radii, np.float64),
        np.asarray(scene.mat_kind),
        np.asarray(scene.albedo, np.float64),
        np.asarray(scene.fuzz, np.float64),
        np.asarray(scene.ior, np.float64),
    )

    directions = [
        (0.0, 0.0, -1.0),    # center sphere head-on
        (1.0, 0.0, -1.0),    # metal sphere
        (-1.0, 0.0, -1.0),   # dielectric
        (0.0, -0.3, -1.0),   # ground
    ]
    n_samples = 1500
    depth = 10
    rng = np.random.default_rng(42)

    for dir3 in directions:
        # Reference port estimate.
        ref = np.mean(
            [
                _numpy_reference_trace(
                    scene_np, np.zeros(3), np.array(dir3, np.float64), depth, rng
                )
                for _ in range(n_samples)
            ],
            axis=0,
        )
        # Wavefront estimate (each sample gets its own key).
        d = jnp.tile(jnp.array([dir3], jnp.float32), (n_samples, 1))
        rad, _ = integrator.trace_rays(
            scene, jnp.zeros_like(d), d, _keys(n_samples, seed=hash(dir3) % 2**31),
            max_depth=depth,
        )
        ours = np.asarray(rad).mean(0)
        # MC standard error is ~<=0.01 per channel at 1500 samples; 5 sigma.
        np.testing.assert_allclose(ours, ref, atol=0.06), (dir3, ours, ref)

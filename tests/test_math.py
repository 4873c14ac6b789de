"""Unit tests for the math layer vs closed forms (reference: ray.tracer.math.hpp,
ray.hpp; see SURVEY.md section 2A)."""

import jax.numpy as jnp
import numpy as np

from raytracing_tpu.core import math as rmath


def test_reflect_mirror():
    v = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    out = rmath.reflect(v, n)
    np.testing.assert_allclose(np.asarray(out), [[1.0, 1.0, 0.0]], atol=1e-6)


def test_reflect_preserves_tangential_batch():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(32, 3)).astype(np.float32)
    n = rng.normal(size=(32, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    out = np.asarray(rmath.reflect(jnp.asarray(v), jnp.asarray(n)))
    # Normal component flips, tangential preserved.
    np.testing.assert_allclose(
        (out * n).sum(-1), -(v * n).sum(-1), atol=1e-5
    )
    np.testing.assert_allclose(
        out - (out * n).sum(-1, keepdims=True) * n,
        v - (v * n).sum(-1, keepdims=True) * n,
        atol=1e-5,
    )


def test_refract_snells_law():
    # 45 degrees into eta=0.75 medium ratio.
    theta_i = np.pi / 4
    uv = jnp.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]], dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]])
    eta = 0.75
    out = np.asarray(rmath.refract(uv, n, jnp.float32(eta)))[0]
    sin_t = np.abs(out[0]) / np.linalg.norm(out)
    np.testing.assert_allclose(sin_t, eta * np.sin(theta_i), atol=1e-6)
    assert out[1] < 0  # transmitted into the surface
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-6)


def test_refract_normal_incidence():
    uv = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    out = np.asarray(rmath.refract(uv, n, jnp.float32(0.5)))[0]
    np.testing.assert_allclose(out, [0.0, -1.0, 0.0], atol=1e-6)


def test_near_zero():
    v = jnp.array(
        [[1e-9, 1e-9, 1e-9], [1e-7, 0.0, 0.0], [0.0, 0.0, 0.0]], dtype=jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(rmath.near_zero(v)), [True, False, True]
    )


def test_point_at_param():
    o = jnp.array([[1.0, 2.0, 3.0]])
    d = jnp.array([[0.0, 1.0, -1.0]])
    t = jnp.array([2.0])
    np.testing.assert_allclose(
        np.asarray(rmath.point_at_param(o, d, t)), [[1.0, 4.0, 1.0]], atol=1e-6
    )


def test_normalize_unit_length():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(64, 3)).astype(np.float32) * 10
    out = np.asarray(rmath.normalize(jnp.asarray(v)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)

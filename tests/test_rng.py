"""Counter-based RNG: distribution checks + the order/chunk-invariance
property that replaces the reference's stateful mt19937 (SURVEY.md section 7,
"Hard parts" item 3)."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from raytracing_tpu.core import rng as rrng


def _keys(n: int, seed: int = 0):
    return rrng.ray_keys(jr.key(seed), jnp.arange(n, dtype=jnp.int32))


def test_unit_vectors_are_unit_and_isotropic():
    v = np.asarray(rrng.unit_vector(_keys(4096)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # Mean of a uniform sphere direction is 0; per-component s.e. ~ 1/sqrt(3N).
    assert np.abs(v.mean(0)).max() < 5.0 / np.sqrt(3 * 4096)
    # Each component's second moment is 1/3 for the uniform sphere.
    np.testing.assert_allclose((v**2).mean(0), 1.0 / 3.0, atol=0.02)


def test_unit_disk_uniform():
    p = np.asarray(rrng.in_unit_disk(_keys(4096)))
    r2 = (p**2).sum(-1)
    assert (r2 <= 1.0 + 1e-6).all()
    # Uniform disk => r^2 ~ U[0,1]: mean 1/2, and angle uniform.
    np.testing.assert_allclose(r2.mean(), 0.5, atol=0.03)
    theta = np.arctan2(p[:, 1], p[:, 0])
    np.testing.assert_allclose(theta.mean(), 0.0, atol=0.1)


def test_sample_square_range_and_mean():
    s = np.asarray(rrng.sample_square(_keys(4096)))
    assert (s >= -0.5).all() and (s < 0.5).all()
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.02)


def test_uniform_range():
    u = np.asarray(rrng.uniform(_keys(4096), 1.2, 1.6))
    assert (u >= 1.2).all() and (u < 1.6).all()
    np.testing.assert_allclose(u.mean(), 1.4, atol=0.01)


def test_draws_depend_only_on_global_id():
    """The property that makes sharding/chunking deterministic: the draw for
    global ray id i is the same whether computed in one batch or many, in any
    order."""
    base = jr.key(7)
    ids = jnp.arange(100, dtype=jnp.int32)
    full = np.asarray(rrng.unit_vector(rrng.ray_keys(base, ids)))
    # Chunked into odd-sized pieces, reversed order:
    parts = []
    for lo, hi in [(60, 100), (13, 60), (0, 13)]:
        parts.append(np.asarray(rrng.unit_vector(rrng.ray_keys(base, ids[lo:hi]))))
    chunked = np.concatenate(parts[::-1], axis=0)
    np.testing.assert_array_equal(full, chunked)


def test_streams_are_independent():
    keys = _keys(256)
    a = np.asarray(rrng.uniform(rrng.fold(keys, 0)))
    b = np.asarray(rrng.uniform(rrng.fold(keys, 1)))
    assert not np.allclose(a, b)
    assert np.abs(np.corrcoef(a, b)[0, 1]) < 0.15

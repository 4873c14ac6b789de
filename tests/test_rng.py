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

# --- kernel software PRNG (ops/pallas/trace.py hash generator) ---------------


def test_kernel_hash_rng_uniform_and_decorrelated():
    """The megakernel's counter-based murmur-finalizer draws must be U[0,1):
    correct range, flat histogram, decorrelated across draw index, lanes,
    and stream keys. (Plain jnp functions -- testable outside the kernel.)"""
    from raytracing_tpu.ops.pallas import trace as ptrace

    lane_h = ptrace._lane_hash((8, 128))
    seed_h = ptrace._fmix32(jnp.int32(3) + jnp.int32(ptrace._GOLD))

    draws = []
    for it in range(64):  # 64 streams x 7 draws x 1024 lanes = 458k samples
        s = ptrace._fmix32(jnp.int32(it) * jnp.int32(ptrace._GOLD) + seed_h)
        draws.append(
            np.stack([
                np.asarray(ptrace._uniform01_from(lane_h, s, j)).ravel()
                for j in range(7)
            ])
        )
    u = np.stack(draws)  # (64, 7, 1024)

    assert (u >= 0.0).all() and (u < 1.0).all()
    n = u.size
    np.testing.assert_allclose(u.mean(), 0.5, atol=5.0 / np.sqrt(12 * n))
    np.testing.assert_allclose(u.var(), 1.0 / 12.0, atol=0.002)
    # Chi-square over 32 bins: statistic ~ chi2(31); 5-sigma bound ~ 31+5*sqrt(62).
    counts, _ = np.histogram(u, bins=32, range=(0.0, 1.0))
    expect = n / 32.0
    chi2 = ((counts - expect) ** 2 / expect).sum()
    assert chi2 < 31 + 5 * np.sqrt(62), f"chi2={chi2:.1f}"
    # Draw-index and lane-neighbor correlations at noise level.
    flat = u.reshape(64, 7, 1024)
    c01 = np.corrcoef(flat[:, 0, :].ravel(), flat[:, 1, :].ravel())[0, 1]
    lag = np.corrcoef(flat[:, 0, :-1].ravel(), flat[:, 0, 1:].ravel())[0, 1]
    assert abs(c01) < 0.01 and abs(lag) < 0.01, (c01, lag)
    # Distinct streams must give distinct draw sets.
    assert not np.array_equal(u[0], u[1])

"""Material scatter semantics vs the reference's three BSDFs
(material.defs.cc:31-87). unit_vec/urand are explicit inputs here, so exact
branch behavior is testable without stochastic sampling."""

import jax.numpy as jnp
import numpy as np

from raytracing_tpu.ops.scatter import scatter
from raytracing_tpu.scene.types import MaterialKind


def _call(kind, d, n, front=True, albedo=(0.8, 0.6, 0.4), fuzz=0.0, ior=1.5,
          unit_vec=(0.0, 0.0, 1.0), urand=0.5):
    new_dir, atten, ok = scatter(
        jnp.array([d], jnp.float32),
        jnp.array([n], jnp.float32),
        jnp.array([front]),
        jnp.array([int(kind)], jnp.int32),
        jnp.array([albedo], jnp.float32),
        jnp.array([fuzz], jnp.float32),
        jnp.array([ior], jnp.float32),
        jnp.array([unit_vec], jnp.float32),
        jnp.array([urand], jnp.float32),
    )
    return np.asarray(new_dir)[0], np.asarray(atten)[0], bool(np.asarray(ok)[0])


def test_lambertian_direction_and_albedo():
    # dir = normal + unit_vec (material.defs.cc:33).
    d, a, ok = _call(MaterialKind.LAMBERTIAN, (0, 0, -1), (0, 0, 1),
                     unit_vec=(1.0, 0.0, 0.0))
    assert ok
    np.testing.assert_allclose(d, [1.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(a, [0.8, 0.6, 0.4], atol=1e-6)


def test_lambertian_degenerate_falls_back_to_normal():
    # unit_vec == -normal -> near-zero scatter dir -> normal (material.defs.cc:34-36).
    d, _, ok = _call(MaterialKind.LAMBERTIAN, (0, 0, -1), (0, 0, 1),
                     unit_vec=(0.0, 0.0, -1.0))
    assert ok
    np.testing.assert_allclose(d, [0.0, 0.0, 1.0], atol=1e-6)


def test_metal_exact_reflection_fuzz0():
    # 45-degree incoming, fuzz 0: exact mirror, normalized (material.defs.cc:46-47).
    d, a, ok = _call(MaterialKind.METALLIC, (2.0, -2.0, 0.0), (0, 1, 0),
                     unit_vec=(0.0, 0.0, 1.0), fuzz=0.0)
    assert ok
    np.testing.assert_allclose(d, np.array([1, 1, 0]) / np.sqrt(2), atol=1e-6)
    np.testing.assert_allclose(a, [0.8, 0.6, 0.4], atol=1e-6)


def test_metal_fuzz_perturbs_by_fuzz_times_unit():
    d, _, ok = _call(MaterialKind.METALLIC, (2.0, -2.0, 0.0), (0, 1, 0),
                     unit_vec=(0.0, 0.0, 1.0), fuzz=0.3)
    expected = np.array([1, 1, 0]) / np.sqrt(2) + 0.3 * np.array([0, 0, 1])
    np.testing.assert_allclose(d, expected, atol=1e-6)
    assert ok


def test_metal_absorbs_below_surface():
    # Large fuzz pushing the scattered ray under the surface -> absorbed
    # (material.defs.cc:48-54 returns nullopt).
    _, _, ok = _call(MaterialKind.METALLIC, (2.0, -2.0, 0.0), (0, 1, 0),
                     unit_vec=(0.0, -1.0, 0.0), fuzz=2.0)
    assert not ok


def test_dielectric_total_internal_reflection():
    # Inside glass (front_face False -> eta = ior = 1.5), grazing 60 degrees:
    # sin_theta * eta > 1 -> must reflect (material.defs.cc:72-74).
    s60, c60 = np.sin(np.pi / 3), np.cos(np.pi / 3)
    d, a, ok = _call(MaterialKind.DIELECTRIC, (s60, -c60, 0.0), (0, 1, 0),
                     front=False, ior=1.5, urand=1.0, albedo=(1, 1, 1))
    assert ok
    np.testing.assert_allclose(d, [s60, c60, 0.0], atol=1e-6)
    np.testing.assert_allclose(a, [1.0, 1.0, 1.0], atol=1e-6)


def test_dielectric_refracts_when_urand_high():
    # Entering glass at 45 degrees, urand=1.0 -> Schlick can't win -> refract;
    # Snell: sin_t = sin(45)/1.5.
    s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
    d, _, ok = _call(MaterialKind.DIELECTRIC, (s, -c, 0.0), (0, 1, 0),
                     front=True, ior=1.5, urand=1.0)
    assert ok
    sin_t = abs(d[0]) / np.linalg.norm(d)
    np.testing.assert_allclose(sin_t, s / 1.5, atol=1e-6)
    assert d[1] < 0  # continues into the medium


def test_dielectric_reflects_when_urand_low():
    # urand = 0 -> schlick > 0 always wins -> reflect (material.defs.cc:73).
    s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
    d, _, ok = _call(MaterialKind.DIELECTRIC, (s, -c, 0.0), (0, 1, 0),
                     front=True, ior=1.5, urand=0.0)
    assert ok
    np.testing.assert_allclose(d, [s, c, 0.0], atol=1e-6)


def test_dielectric_schlick_threshold_value():
    """Schlick r(cos) = r0 + (1-r0)(1-cos)^5 with r0=((1-eta)/(1+eta))^2:
    verify the coin flip happens exactly at the analytic value."""
    s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
    eta = 1.0 / 1.5
    r0 = ((1 - eta) / (1 + eta)) ** 2
    schlick = r0 + (1 - r0) * (1 - c) ** 5
    # urand just below the threshold -> reflect; just above -> refract.
    d_lo, _, _ = _call(MaterialKind.DIELECTRIC, (s, -c, 0.0), (0, 1, 0),
                       front=True, ior=1.5, urand=schlick - 1e-4)
    d_hi, _, _ = _call(MaterialKind.DIELECTRIC, (s, -c, 0.0), (0, 1, 0),
                       front=True, ior=1.5, urand=schlick + 1e-4)
    assert d_lo[1] > 0  # reflected
    assert d_hi[1] < 0  # refracted


def test_mixed_batch_dispatch():
    """One call with all three kinds dispatches each lane to its model."""
    new_dir, atten, ok = scatter(
        jnp.array([[0, 0, -1], [2, -2, 0], [0, -1, 0]], jnp.float32),
        jnp.array([[0, 0, 1], [0, 1, 0], [0, 1, 0]], jnp.float32),
        jnp.array([True, True, True]),
        jnp.array([0, 1, 2], jnp.int32),
        jnp.array([[0.5] * 3, [0.9] * 3, [1.0] * 3], jnp.float32),
        jnp.array([0.0, 0.0, 0.0], jnp.float32),
        jnp.array([1.0, 1.0, 1.5], jnp.float32),
        jnp.array([[1, 0, 0]] * 3, jnp.float32),
        jnp.array([1.0, 1.0, 1.0], jnp.float32),
    )
    new_dir = np.asarray(new_dir)
    np.testing.assert_allclose(new_dir[0], [1, 0, 1], atol=1e-6)      # lambertian
    np.testing.assert_allclose(new_dir[1], np.array([1, 1, 0]) / np.sqrt(2), atol=1e-6)  # metal
    assert new_dir[2][1] < 0  # dielectric refracts straight-ish down
    assert np.asarray(ok).all()

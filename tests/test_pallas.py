"""Pallas megakernel correctness, run on CPU via TPU-interpret mode.

The deterministic-scene test is the strong one: with only fuzz-0 metals (no
RNG influence on any path), the fused kernel must agree with the XLA
wavefront integrator to float roundoff, including identical traced-segment
counts. RNG-dependent scenes are compared distributionally (the kernel uses
the TPU core PRNG; the XLA path uses threefry)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from raytracing_tpu.core import rng as rrng
from raytracing_tpu.models import integrator
from raytracing_tpu.ops.pallas import trace as ptrace
from raytracing_tpu.scene.types import SceneBuilder


def _keys(n, seed=0):
    return rrng.ray_keys(jr.key(seed), jnp.arange(n, dtype=jnp.int32))


def _run_fused(scene, o, d, depth, seed=3, tile_offset=0):
    with pltpu.force_tpu_interpret_mode():
        rad, seg = ptrace.trace_rays_fused(
            scene, o, d, jnp.int32(seed), jnp.int32(tile_offset), depth
        )
    return np.asarray(rad), int(seg)


def test_deterministic_scene_matches_xla_exactly():
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0)
    b.add_metallic_sphere((0.0, 0.0, -1.0), 0.5, (0.8, 0.6, 0.2), 0.0)
    b.add_metallic_sphere((1.2, 0.0, -1.5), 0.7, (0.9, 0.9, 0.9), 0.0)
    scene = b.build()

    n = 1024
    keys = _keys(n, seed=1)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)

    rad_p, seg_p = _run_fused(scene, o, d, 8)
    rad_x, seg_x = integrator.trace_rays(scene, o, d, keys, 8)
    assert seg_p == int(seg_x)
    np.testing.assert_allclose(rad_p, np.asarray(rad_x), atol=2e-4, rtol=1e-3)


def test_sky_only():
    scene = SceneBuilder().build()  # N=0 -> all padding, every ray misses
    d = jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (1024, 1))
    d = d.at[1].set(jnp.array([0.0, -1.0, 0.0]))
    rad, seg = _run_fused(scene, jnp.zeros((1024, 3)), d, 4)
    np.testing.assert_allclose(rad[0], [0.5, 0.7, 1.0], atol=1e-6)
    np.testing.assert_allclose(rad[1], [1.0, 1.0, 1.0], atol=1e-6)
    assert seg == 1024


def test_depth_zero_black():
    scene = SceneBuilder().build()
    d = jnp.ones((1024, 3), jnp.float32)
    rad, seg = _run_fused(scene, jnp.zeros((1024, 3)), d, 0)
    np.testing.assert_array_equal(rad, 0.0)
    assert seg == 0


def test_scene_larger_than_one_sphere_block():
    """> 128 spheres exercises the multi-block sweep; closest-hit must match
    the XLA min-reduction exactly on a deterministic (all-metal) scene."""
    rng = np.random.default_rng(8)
    b = SceneBuilder()
    for _ in range(150):
        b.add_metallic_sphere(rng.normal(size=3) * 4, rng.uniform(0.2, 0.8),
                              (0.9, 0.9, 0.9), 0.0)
    scene = b.build()
    n = 1024
    keys = _keys(n, seed=4)
    d = rrng.unit_vector(keys)
    o = jnp.zeros((n, 3), jnp.float32)
    rad_p, seg_p = _run_fused(scene, o, d, 3)
    rad_x, seg_x = integrator.trace_rays(scene, o, d, keys, 3)
    assert seg_p == int(seg_x)
    np.testing.assert_allclose(rad_p, np.asarray(rad_x), atol=2e-4, rtol=1e-3)


_NO_HW_PRNG = jax.default_backend() not in ("tpu", "axon")


@pytest.mark.skipif(
    _NO_HW_PRNG,
    reason="TPU-interpret mode has no PRNG emulation (prng_random_bits "
    "returns zeros on CPU); RNG-dependent parity runs on real TPU only",
)
def test_distributional_parity_full_materials():
    """All three materials: per-direction mean radiance matches the XLA
    integrator within MC error (independent RNG streams)."""
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5))
    b.add_lambertian_sphere((0.0, 0.0, -1.0), 0.5, (0.7, 0.3, 0.3))
    b.add_metallic_sphere((1.0, 0.0, -1.0), 0.5, (0.8, 0.8, 0.8), 0.2)
    b.add_dielectric_sphere((-1.0, 0.0, -1.0), 0.5, 1.5)
    scene = b.build()

    n = 2048
    for dir3, seed in [((0.0, 0.0, -1.0), 5), ((-1.0, 0.0, -1.0), 6)]:
        d = jnp.tile(jnp.array([dir3], jnp.float32), (n, 1))
        o = jnp.zeros_like(d)
        rad_p, _ = _run_fused(scene, o, d, 8, seed=seed)
        rad_x, _ = integrator.trace_rays(scene, o, d, _keys(n, seed), 8)
        np.testing.assert_allclose(
            rad_p.mean(0), np.asarray(rad_x).mean(0), atol=0.06
        ), dir3


@pytest.mark.skipif(
    _NO_HW_PRNG,
    reason="TPU-interpret mode has no PRNG emulation; stream tests need "
    "real TPU",
)
def test_tile_offset_changes_stream():
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, 0.0, -1.0), 0.5, (0.7, 0.3, 0.3))
    scene = b.build()
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (1024, 1))
    o = jnp.zeros_like(d)
    r0, _ = _run_fused(scene, o, d, 4, seed=1, tile_offset=0)
    r1, _ = _run_fused(scene, o, d, 4, seed=1, tile_offset=1)
    r0b, _ = _run_fused(scene, o, d, 4, seed=1, tile_offset=0)
    assert not np.array_equal(r0, r1)      # distinct streams per tile index
    np.testing.assert_array_equal(r0, r0b)  # deterministic


def test_bad_ray_count_raises():
    scene = SceneBuilder().build()
    o = jnp.zeros((1000, 3))
    with pytest.raises(ValueError):
        ptrace.trace_rays_fused(
            scene, o, o, jnp.int32(0), jnp.int32(0), 2
        )


def test_pack_scene_padding():
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, 0.0, -1.0), 0.5, (0.7, 0.3, 0.3))
    scene = b.build()
    geom_t, mats_t, n = ptrace.pack_scene(scene)
    assert n == 1
    assert geom_t.shape == (128, 8)
    assert mats_t.shape == (128, 8)
    # Padding spheres: radius 0, far away, ior 1.
    assert float(geom_t[5, 3]) == 0.0
    assert float(geom_t[5, 0]) == 1.0e9
    assert float(mats_t[5, 4]) == 1.0

"""Counter-based RNG (threefry) for reproducible, order-independent sampling.

Replaces the reference's per-worker-thread stateful ``std::mt19937``
(``/root/reference/src/random.number.gen.hpp``). The reference seeds each
worker from ``std::random_device`` (``random.number.gen.hpp:45-46``) so its
renders are not reproducible at all and sample values depend on thread/tile
scheduling order. Here every random draw is a pure function of

    (seed, global_ray_id, stream_tag [, bounce_index])

so results are bitwise identical regardless of device count, sharding layout,
chunking of the sample loop, or evaluation order -- the property that makes
multi-chip rendering deterministic.

Sampler parity notes (distributional, never bitwise -- SURVEY.md section 7
"Hard parts" item 3):
- ``sample_square``: uniform jitter in [-0.5, 0.5)^2
  == ``random.number.gen.hpp:16`` (z component is unused by the camera).
- ``unit_vector``: uniform direction on S^2 via normalized Gaussian instead of
  the reference's rejection loop (``random.number.gen.hpp:21-29``) -- same
  distribution, no data-dependent loop (TPU-hostile).
- ``in_unit_disk``: uniform in the unit disk via sqrt-radius polar sampling
  instead of rejection (``random.number.gen.hpp:35-42``) -- same distribution.
- ``uniform``: U[0,1) == ``random.number.gen.hpp:11``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr

# Stream tags: distinct sub-streams drawn from one per-ray key.
STREAM_CAM_JITTER = 0  # pixel-footprint jitter           (get_ray, core.cc:219)
STREAM_CAM_DISK = 1    # defocus-disk lens sample         (get_ray, core.cc:223-225)
STREAM_UNIT_VEC = 2    # scatter unit vector              (material.defs.cc:33,47)
STREAM_SCHLICK = 3     # dielectric reflectance coin flip (material.defs.cc:73)


def ray_keys(base_key: jax.Array, global_ids: jnp.ndarray) -> jax.Array:
    """One independent key per ray, derived from its global ray id.

    ``global_ids`` is typically ``pixel_index * spp + sample_index`` so the
    stream for a given (pixel, sample) is invariant to how work is chunked or
    sharded.
    """
    return jax.vmap(lambda i: jr.fold_in(base_key, i))(global_ids)


def fold(keys: jax.Array, data: jnp.ndarray | int) -> jax.Array:
    """Vectorized ``fold_in`` over a batch of keys (``data`` may be traced)."""
    data = jnp.asarray(data, dtype=jnp.uint32)
    if data.ndim == 0:
        return jax.vmap(lambda k: jr.fold_in(k, data))(keys)
    return jax.vmap(jr.fold_in)(keys, data)


def uniform(keys: jax.Array, minval: float = 0.0, maxval: float = 1.0) -> jnp.ndarray:
    """Per-ray scalar U[minval, maxval) -- ``random.number.gen.hpp:11-14``."""
    return jax.vmap(lambda k: jr.uniform(k, (), jnp.float32, minval, maxval))(keys)


def uniform3(keys: jax.Array, minval: float = 0.0, maxval: float = 1.0) -> jnp.ndarray:
    """Per-ray (3,) vector of independent U[minval, maxval)."""
    return jax.vmap(lambda k: jr.uniform(k, (3,), jnp.float32, minval, maxval))(keys)


def sample_square(keys: jax.Array) -> jnp.ndarray:
    """Per-ray (2,) jitter in [-0.5, 0.5)^2 (``random.number.gen.hpp:16``)."""
    return jax.vmap(lambda k: jr.uniform(k, (2,), jnp.float32, -0.5, 0.5))(keys)


def unit_vector(keys: jax.Array) -> jnp.ndarray:
    """Per-ray (3,) uniform direction on the unit sphere.

    Normalized isotropic Gaussian == the reference's rejection-sampled
    ``random_unit_vector`` (``random.number.gen.hpp:21-29``) in distribution.
    The 1e-20 norm clamp guards the measure-zero all-zeros draw.
    """
    g = jax.vmap(lambda k: jr.normal(k, (3,), jnp.float32))(keys)
    n2 = jnp.maximum(jnp.sum(g * g, axis=-1, keepdims=True), 1.0e-20)
    return g * jax.lax.rsqrt(n2)


def in_unit_disk(keys: jax.Array) -> jnp.ndarray:
    """Per-ray (2,) point uniform in the unit disk.

    Polar (sqrt(u) radius) sampling == the reference's rejection-sampled
    ``random_vector_on_unit_disk`` (``random.number.gen.hpp:35-42``) in
    distribution.
    """
    u = jax.vmap(lambda k: jr.uniform(k, (2,), jnp.float32))(keys)
    r = jnp.sqrt(u[..., 0])
    theta = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)

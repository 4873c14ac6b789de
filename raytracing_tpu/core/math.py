"""Vector math primitives (L1 of the layer map).

TPU-native reimplementation of the reference's math layer
(``/root/reference/src/ray.tracer.math.hpp``, ``src/ray.hpp``,
``src/interval.hpp``). Everything here is batched: a "vec3" is an array whose
last axis has size 3, and every function works on arbitrary leading batch
dimensions so the whole image's rays are processed as one tensor program.

Reference parity notes (file:line cites into /root/reference):
- ``reflect``   == glm::reflect used at ``ray.tracer.material.defs.cc:46``.
- ``refract``   == glm::refract used at ``ray.tracer.material.defs.cc:76``
  (the hand-rolled ``refract`` at ``ray.tracer.math.hpp:21-26`` is dead code).
- ``near_zero`` == ``ray.tracer.math.hpp:16-19`` (1e-8 per-component test).
- ``point_at_param`` == ``ray.hpp:9``.
- Intervals: the reference clips hit-t to open intervals via
  ``Interval::surrounds`` (``interval.hpp:14``, strict inequalities); here the
  interval is just a pair of scalars threaded through ``ops.intersect``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The reference traces with t in [1e-4, +inf) -- ray.tracer.core.cc:243.
T_MIN: float = 1.0e-4
T_MAX: float = float(jnp.inf)

NEAR_ZERO_EPS: float = 1.0e-8  # ray.tracer.math.hpp:17


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def length_sq(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(v * v, axis=-1)


def normalize(v: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Unit-length vector along ``v``.

    With ``eps > 0`` the norm is clamped away from zero so a (measure-zero)
    degenerate input yields a finite result instead of NaN; used where the
    reference's rejection sampler structurally cannot produce a zero vector.
    """
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    if eps:
        n2 = jnp.maximum(n2, eps)
    return v * jax.lax.rsqrt(n2)


def near_zero(v: jnp.ndarray) -> jnp.ndarray:
    """True where every component's magnitude is < 1e-8.

    Parity: ``ray.tracer.math.hpp:16-19``.
    """
    return jnp.all(jnp.abs(v) < NEAR_ZERO_EPS, axis=-1)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror ``v`` about unit normal ``n`` (== glm::reflect).

    Parity: used for metal at ``ray.tracer.material.defs.cc:46`` and for
    dielectric total-internal-reflection at ``:74``.
    """
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv: jnp.ndarray, n: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """Snell refraction of unit vector ``uv`` about unit normal ``n``.

    ``eta`` is eta_incident / eta_transmitted, broadcast over the batch.
    Parity: glm::refract semantics as invoked at
    ``ray.tracer.material.defs.cc:76`` (same formula as the unused
    ``ray.tracer.math.hpp:21-26``).
    """
    eta = jnp.asarray(eta)[..., None]
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)[..., None]
    r_out_perp = eta * (uv + cos_theta * n)
    k = 1.0 - jnp.sum(r_out_perp * r_out_perp, axis=-1, keepdims=True)
    r_out_parallel = -jnp.sqrt(jnp.abs(k)) * n
    return r_out_perp + r_out_parallel


def point_at_param(origin: jnp.ndarray, direction: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """``origin + t * direction`` (parity: ``ray.hpp:9``)."""
    return origin + t[..., None] * direction


def lerp(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return (1.0 - t) * a + t * b

"""Material scattering: all three BSDF models computed and blended by mask.

TPU-native replacement for the reference's tagged-union switch dispatch
(``/root/reference/src/ray.tracer.material.defs.cc:89-109``). On SIMD
hardware, divergent per-ray dispatch over 3 material kinds is cheapest as
"compute every model, select by mask" (SURVEY.md section 7 "Hard parts"
item 2); all three scatters share one unit-vector draw and one uniform draw
per ray per bounce.

Per-model parity (file:line into /root/reference):

- Lambertian (``material.defs.cc:31-42``): ``dir = normal + unit_vector``;
  if near-zero, fall back to the normal. Always scatters; attenuation=albedo.
- Metallic (``material.defs.cc:44-55``): reflect the (unnormalized) incoming
  direction about the normal, normalize, add ``fuzz * unit_vector``; ABSORB
  (no scatter) when the result points below the surface
  (``dot(scattered, normal) <= 0``). Attenuation = albedo.
- Dielectric (``material.defs.cc:57-87``): eta = 1/ior when hitting the front
  face else ior; reflect on total internal reflection OR with Schlick
  probability, else Snell refraction. Always scatters; attenuation = 1.

Scattered-ray origin: the reference restarts at the hit point itself and
relies on the t_min = 1e-4 interval to avoid self-intersection
(``ray.tracer.core.cc:243``). This module follows that -- ``scatter`` returns
directions only and never offsets origins -- but the INTEGRATORS deviate
deliberately: both restart the next segment at
``hit + SELF_HIT_OFFSET * normal`` (``models/integrator.py`` SELF_HIT_OFFSET
and the kernel's matching anti-acne restart offset in
``ops/pallas/trace.py::_bounce_core``; rationale in ARCHITECTURE.md section 2:
the packed-key argmin quantizes t, so the interval trick alone is not enough).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import math as rmath
from ..scene.types import MaterialKind


def scatter(
    directions: jnp.ndarray,
    normals: jnp.ndarray,
    front_face: jnp.ndarray,
    mat_kind: jnp.ndarray,
    albedo: jnp.ndarray,
    fuzz: jnp.ndarray,
    ior: jnp.ndarray,
    unit_vec: jnp.ndarray,
    urand: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scatter a batch of rays off their hit surfaces.

    Args:
      directions: ``(B,3)`` incoming ray directions (unnormalized, as traced).
      normals: ``(B,3)`` unit, front-face-corrected normals.
      front_face: ``(B,)`` bool from the intersection record.
      mat_kind / albedo / fuzz / ior: ``(B,)`` / ``(B,3)`` / ``(B,)`` / ``(B,)``
        per-ray material attributes (already gathered by hit index).
      unit_vec: ``(B,3)`` uniform unit-sphere sample for this bounce.
      urand: ``(B,)`` uniform [0,1) sample for the dielectric coin flip.

    Returns:
      ``(new_direction, attenuation, scattered)``: the scattered ray direction
      ``(B,3)``, throughput multiplier ``(B,3)``, and a ``(B,)`` bool that is
      False where the material absorbed the ray (metal below-surface case ==
      the reference's ``tl::nullopt`` at ``material.defs.cc:54``).
    """
    # --- Lambertian (material.defs.cc:31-42) -------------------------------
    lam_dir = normals + unit_vec
    lam_dir = jnp.where(rmath.near_zero(lam_dir)[..., None], normals, lam_dir)

    # --- Metallic (material.defs.cc:44-55) ---------------------------------
    reflected = rmath.reflect(directions, normals)
    met_dir = rmath.normalize(reflected, eps=1.0e-20) + fuzz[..., None] * unit_vec
    met_ok = rmath.dot(met_dir, normals) > 0.0

    # --- Dielectric (material.defs.cc:57-87) -------------------------------
    eta = jnp.where(front_face, 1.0 / ior, ior)
    unit_dir = rmath.normalize(directions, eps=1.0e-20)
    cos_theta = jnp.minimum(rmath.dot(-unit_dir, normals), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    cannot_refract = (eta * sin_theta) > 1.0
    r0 = (1.0 - eta) / (1.0 + eta)
    r0 = r0 * r0
    schlick = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5  # material.defs.cc:64-69
    reflect_choice = cannot_refract | (schlick > urand)
    die_dir = jnp.where(
        reflect_choice[..., None],
        rmath.reflect(unit_dir, normals),
        rmath.refract(unit_dir, normals, eta),
    )

    # --- Blend by material kind (replaces switch, material.defs.cc:92-108) --
    is_lam = (mat_kind == MaterialKind.LAMBERTIAN)[..., None]
    is_met = (mat_kind == MaterialKind.METALLIC)[..., None]
    new_dir = jnp.where(is_lam, lam_dir, jnp.where(is_met, met_dir, die_dir))

    # Attenuation: albedo for lambertian/metal; the scene packs albedo = 1 for
    # dielectrics (material.defs.cc:80), so albedo works for all three.
    attenuation = albedo

    scattered = jnp.where(
        mat_kind == MaterialKind.METALLIC, met_ok, jnp.ones_like(met_ok)
    )
    return new_dir, attenuation, scattered

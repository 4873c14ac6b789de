"""Thin-lens camera: declarative parameters, derived frame, batched ray gen.

TPU-native re-expression of the reference camera:
- ``CameraParameters``: same fields/defaults as
  ``/root/reference/src/camera.parameters.hpp:6-17`` (JSON-compatible with the
  shipped ``data/config/world.config.json`` "camera" object).
- ``DerivedCamera`` / ``derive``: the viewport / pixel-delta / defocus-disk
  basis math of ``make_camera_frame`` (``ray.tracer.core.cc:158-169``) and
  ``RayTracingCore::default_setup`` (``ray.tracer.core.cc:171-216``).
- ``generate_rays``: batched equivalent of ``RayTracingCore::get_ray``
  (``ray.tracer.core.cc:218-234``): jittered sample inside the pixel
  footprint; ray origin on the defocus disk when ``defocus_angle > 0``.

Design note: the reference computes one ray at a time inside a worker thread;
here ray generation is one tensor op over the whole (pixel, sample) batch so
XLA fuses it into the integrator's first bounce.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import rng as _rng


@dataclasses.dataclass(frozen=True)
class CameraParameters:
    """Declarative camera config (``camera.parameters.hpp:6-17``).

    Defaults match the reference's in-code ``WorldDefinition`` defaults
    (``ray.tracer.core.cc:68-79``); the shipped JSON overrides several
    (``data/config/world.config.json:2-25``).
    """

    aspect_ratio: float = 16.0 / 9.0
    image_width: int = 1200
    samples_per_pixel: int = 100
    max_depth: int = 50
    vertical_fov: float = 20.0
    defocus_angle: float = 10.0
    focus_distance: float = 3.4
    lookfrom: Sequence[float] = (-2.0, 2.0, 1.0)
    lookat: Sequence[float] = (0.0, 0.0, -1.0)
    world_up: Sequence[float] = (0.0, 1.0, 0.0)

    @property
    def image_height(self) -> int:
        # uint32(float(width) / aspect) -- ray.tracer.core.cc:174-175
        return int(float(self.image_width) / self.aspect_ratio)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DerivedCamera:
    """Precomputed camera frame shared read-only by every ray.

    Mirrors the camera fields of the flat ``RayTracingCore`` struct
    (``ray.tracer.core.hpp:18-42`` / ``core.cc:198-215``).
    """

    pixel00: jnp.ndarray          # rts_pixel00        (core.cc:209)
    pixel_delta_u: jnp.ndarray    # rts_pixel_delta_u  (core.cc:207)
    pixel_delta_v: jnp.ndarray    # rts_pixel_delta_v  (core.cc:208)
    center: jnp.ndarray           # rts_cam_center     (core.cc:210)
    defocus_disk_u: jnp.ndarray   # rts_defocus_disk_u (core.cc:211)
    defocus_disk_v: jnp.ndarray   # rts_defocus_disk_v (core.cc:212)
    defocus_angle: jnp.ndarray    # rts_defocus_angle  (core.cc:201)
    image_width: int = dataclasses.field(metadata=dict(static=True))
    image_height: int = dataclasses.field(metadata=dict(static=True))


def derive(params: CameraParameters) -> DerivedCamera:
    """Camera params -> ray-generation frame (``ray.tracer.core.cc:171-216``).

    Host-side float32 math (numpy): runs once per scene, not in the jit.
    """
    width = int(params.image_width)
    height = params.image_height

    theta = math.radians(params.vertical_fov)
    h = math.tan(theta * 0.5)
    viewport_height = 2.0 * h * params.focus_distance       # core.cc:179
    viewport_width = viewport_height * (float(width) / height)  # core.cc:180

    lookfrom = np.asarray(params.lookfrom, np.float32)
    lookat = np.asarray(params.lookat, np.float32)
    world_up = np.asarray(params.world_up, np.float32)

    # make_camera_frame -- core.cc:158-169
    w = lookfrom - lookat
    w = w / np.linalg.norm(w)
    u = np.cross(world_up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)

    viewport_u = u * viewport_width                          # core.cc:185
    viewport_v = -v * viewport_height                        # core.cc:186
    pixel_delta_u = viewport_u / float(width)                # core.cc:188
    pixel_delta_v = viewport_v / float(height)               # core.cc:189

    viewport_upper_left = (
        lookfrom - params.focus_distance * w - viewport_u * 0.5 - viewport_v * 0.5
    )                                                        # core.cc:191-192
    pixel00 = viewport_upper_left + 0.5 * (pixel_delta_u + pixel_delta_v)  # core.cc:193

    defocus_radius = params.focus_distance * math.tan(
        math.radians(params.defocus_angle * 0.5)
    )                                                        # core.cc:195

    f32 = jnp.float32
    return DerivedCamera(
        pixel00=jnp.asarray(pixel00, f32),
        pixel_delta_u=jnp.asarray(pixel_delta_u, f32),
        pixel_delta_v=jnp.asarray(pixel_delta_v, f32),
        center=jnp.asarray(lookfrom, f32),
        defocus_disk_u=jnp.asarray(u * defocus_radius, f32),
        defocus_disk_v=jnp.asarray(v * defocus_radius, f32),
        defocus_angle=jnp.asarray(params.defocus_angle, f32),
        image_width=width,
        image_height=height,
    )


def generate_rays(
    cam: DerivedCamera,
    keys: jax.Array,
    px: jnp.ndarray,
    py: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched ``RayTracingCore::get_ray`` (``ray.tracer.core.cc:218-234``).

    Args:
      cam: derived camera frame.
      keys: per-ray RNG keys, shape ``(B,)``.
      px, py: integer pixel coordinates per ray, shape ``(B,)`` (x = column,
        y = row, y down -- the reference's image convention).

    Returns:
      ``(origins, directions)``, each ``(B, 3)`` float32. Directions are NOT
      normalized, matching ``core.cc:230-233`` (``pixel_sample - ray_origin``).
    """
    jitter = _rng.sample_square(_rng.fold(keys, _rng.STREAM_CAM_JITTER))  # (B, 2)
    fx = px.astype(jnp.float32) + jitter[:, 0]
    fy = py.astype(jnp.float32) + jitter[:, 1]
    pixel_sample = (
        cam.pixel00
        + fx[:, None] * cam.pixel_delta_u
        + fy[:, None] * cam.pixel_delta_v
    )

    # Defocus: origin on the lens disk when defocus_angle > 0 (core.cc:223-228).
    # defocus_angle is a static scene property; both branches are cheap so a
    # masked select keeps the program branch-free.
    disk = _rng.in_unit_disk(_rng.fold(keys, _rng.STREAM_CAM_DISK))  # (B, 2)
    disk_origin = (
        cam.center
        + disk[:, 0:1] * cam.defocus_disk_u
        + disk[:, 1:2] * cam.defocus_disk_v
    )
    origin = jnp.where(cam.defocus_angle > 0.0, disk_origin, cam.center)
    direction = pixel_sample - origin
    return origin.astype(jnp.float32), direction.astype(jnp.float32)

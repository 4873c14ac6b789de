"""Scene model: structure-of-arrays sphere world + material table.

TPU-native redesign of the reference's AoS tagged-union scene
(``/root/reference/src/ray.tracer.object.defs.{hpp,cc}`` and
``src/ray.tracer.material.defs.{hpp,cc}``):

- ``HittableObject`` (tagged union, only Sphere exists --
  ``object.defs.hpp:25-28``) + per-object function-pointer dispatch
  (``object.defs.cc:33-38``)       ->  flat ``centers[N,3] / radii[N]`` arrays
  consumed by one masked min-reduction over all spheres.
- ``Material`` tagged union + switch dispatch (``material.defs.cc:89-109``)
  ->  ``mat_kind[N]`` + per-material parameter arrays; shading computes all
  three scatter models and blends by mask (SIMD-friendly, 3 kinds).
- ``MaterialHandleType`` (strong u32 index, ``material.handle.hpp:6``)
  ->  materials are stored per-object (denormalized), so the hit index IS the
  material index; the separate handle indirection buys nothing on TPU.

All arrays are float32 (the reference mixes float vectors with double
intervals -- ``object.defs.hpp:19``; we standardize on f32 per SURVEY.md
section 7 "Hard parts" item 4).
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp
import numpy as np


class MaterialKind(enum.IntEnum):
    """Parity: ``MaterialKind`` enum, ``material.defs.hpp`` (Lambertian,
    Metallic, Dielectric)."""

    LAMBERTIAN = 0
    METALLIC = 1
    DIELECTRIC = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """SoA sphere world, shared read-only by every ray (device-resident).

    Equivalent information content to ``HittableObject_Collection`` +
    ``MaterialCollection`` (``object.defs.hpp:59-67``,
    ``material.defs.hpp:92-110``), flattened for vector hardware:

      centers  float32[N, 3]  sphere centers
      radii    float32[N]     sphere radii
      mat_kind int32[N]       MaterialKind per sphere
      albedo   float32[N, 3]  lambertian/metal albedo (1.0 for dielectric,
                              matching the dielectric's unit attenuation at
                              ``material.defs.cc:80``)
      fuzz     float32[N]     metal fuzziness (0 otherwise)
      ior      float32[N]     dielectric refraction index (1 otherwise)
    """

    centers: jnp.ndarray
    radii: jnp.ndarray
    mat_kind: jnp.ndarray
    albedo: jnp.ndarray
    fuzz: jnp.ndarray
    ior: jnp.ndarray

    @property
    def num_objects(self) -> int:
        return self.centers.shape[0]


class SceneBuilder:
    """Append-style builder mirroring the reference's
    ``world.add_object(make_sphere(...))`` / ``materials.add(make_*(...))``
    flow (``object.defs.hpp:44-54``, ``material.defs.hpp:92-110``), producing
    packed SoA arrays."""

    def __init__(self) -> None:
        self._centers: list[tuple[float, float, float]] = []
        self._radii: list[float] = []
        self._kind: list[int] = []
        self._albedo: list[tuple[float, float, float]] = []
        self._fuzz: list[float] = []
        self._ior: list[float] = []

    def _push(self, center, radius, kind, albedo, fuzz, ior) -> "SceneBuilder":
        self._centers.append(tuple(float(c) for c in center))
        self._radii.append(float(radius))
        self._kind.append(int(kind))
        self._albedo.append(tuple(float(a) for a in albedo))
        self._fuzz.append(float(fuzz))
        self._ior.append(float(ior))
        return self

    def add_lambertian_sphere(self, center, radius, albedo) -> "SceneBuilder":
        """``make_sphere`` + ``make_lambertian`` (``material.defs.hpp``)."""
        return self._push(center, radius, MaterialKind.LAMBERTIAN, albedo, 0.0, 1.0)

    def add_metallic_sphere(self, center, radius, albedo, fuzz) -> "SceneBuilder":
        return self._push(center, radius, MaterialKind.METALLIC, albedo, fuzz, 1.0)

    def add_dielectric_sphere(self, center, radius, refraction_index) -> "SceneBuilder":
        # Dielectric attenuation is identically 1 (material.defs.cc:80).
        return self._push(
            center, radius, MaterialKind.DIELECTRIC, (1.0, 1.0, 1.0), 0.0, refraction_index
        )

    def __len__(self) -> int:
        return len(self._radii)

    def build(self) -> Scene:
        if not self._radii:
            # Empty world: rays always miss and shade sky (core.cc:254-256).
            # Keep one degenerate (radius 0 => delta < 0 always... radius 0
            # gives delta = h^2 - a*|oc|^2 <= 0 with equality measure-zero)
            # -- instead use an explicit zero-size representation.
            z3 = jnp.zeros((0, 3), jnp.float32)
            z1 = jnp.zeros((0,), jnp.float32)
            return Scene(z3, z1, jnp.zeros((0,), jnp.int32), z3, z1, z1)
        return Scene(
            centers=jnp.asarray(np.array(self._centers, np.float32)),
            radii=jnp.asarray(np.array(self._radii, np.float32)),
            mat_kind=jnp.asarray(np.array(self._kind, np.int32)),
            albedo=jnp.asarray(np.array(self._albedo, np.float32)),
            fuzz=jnp.asarray(np.array(self._fuzz, np.float32)),
            ior=jnp.asarray(np.array(self._ior, np.float32)),
        )

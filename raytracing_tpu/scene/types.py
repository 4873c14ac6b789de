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


class TextureKind(enum.IntEnum):
    """Albedo texture per sphere. SOLID uses the constant ``albedo``;
    CHECKER/IMAGE realize the reference's vendored-but-unwired texturing
    intent (``/root/reference/third_party/stb/stb_image.h`` and the
    commented ``Texture::from_file``, ``renderer.common.cc:285-304``) with
    RTiOW book-2 semantics: checker sampled at the 3D hit point, image
    sampled by sphere UV from the outward unit normal, nearest texel."""

    SOLID = 0
    CHECKER = 1
    IMAGE = 2


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
                              ``material.defs.cc:80``); for CHECKER textures
                              this is the EVEN color
      fuzz     float32[N]     metal fuzziness (0 otherwise)
      ior      float32[N]     dielectric refraction index (1 otherwise)

    Texturing extension (TextureKind; zero-cost when all-SOLID):
      tex_kind      int32[N]    TextureKind per sphere
      albedo2       float32[N,3] checker ODD color (0 otherwise)
      tex_inv_scale float32[N]  checker 1/scale, pre-rounded to an
                                f16-representable value so the kernel's
                                16-bit packing is lossless (0 otherwise)
      tex_id        int32[N]    row into ``textures`` (0 otherwise)
      tex_wh        int32[N,2]  (width, height) of this sphere's texture's
                                valid region inside the padded stack
      textures      float32[T, TH, TW, 3] image texture stack, linear RGB in
                                [0,1] (bytes/255 exactly, no de-gamma --
                                RTiOW image_texture semantics); individual
                                textures are top-left-anchored and padded to
                                the common (TH, TW)

    Triangle-mesh extension (BASELINE configs[3]; zero-cost when absent):
      tri_v0/e1/e2  float32[M,3] triangle vertex + two edges (BVH leaf order)
      tri_mat_kind / tri_albedo / tri_fuzz / tri_ior: per-triangle material
                                columns (denormalized, like spheres)
      bvh_min/max   float32[K,3] flattened skip-link BVH node AABBs
      bvh_skip      int32[K]     node to resume at on AABB miss (scene/mesh.py)
      bvh_first / bvh_count int32[K] leaf triangle ranges (count 0 = inner)
    """

    centers: jnp.ndarray
    radii: jnp.ndarray
    mat_kind: jnp.ndarray
    albedo: jnp.ndarray
    fuzz: jnp.ndarray
    ior: jnp.ndarray
    tex_kind: jnp.ndarray
    albedo2: jnp.ndarray
    tex_inv_scale: jnp.ndarray
    tex_id: jnp.ndarray
    tex_wh: jnp.ndarray
    textures: jnp.ndarray
    tri_v0: jnp.ndarray
    tri_e1: jnp.ndarray
    tri_e2: jnp.ndarray
    tri_mat_kind: jnp.ndarray
    tri_albedo: jnp.ndarray
    tri_fuzz: jnp.ndarray
    tri_ior: jnp.ndarray
    bvh_min: jnp.ndarray
    bvh_max: jnp.ndarray
    bvh_skip: jnp.ndarray
    bvh_first: jnp.ndarray
    bvh_count: jnp.ndarray
    # Static (jit-cache-keyed): texture sampling / triangle intersection
    # compile to nothing for scenes without them.
    has_textures: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    has_triangles: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    @property
    def num_objects(self) -> int:
        return self.centers.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.tri_v0.shape[0]

    @property
    def num_textures(self) -> int:
        return self.textures.shape[0]


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
        self._tex_kind: list[int] = []
        self._albedo2: list[tuple[float, float, float]] = []
        self._tex_inv_scale: list[float] = []
        self._tex_id: list[int] = []
        self._textures: list[np.ndarray] = []
        self._tri_v0: list[np.ndarray] = []
        self._tri_e1: list[np.ndarray] = []
        self._tri_e2: list[np.ndarray] = []
        self._tri_kind: list[np.ndarray] = []
        self._tri_albedo: list[np.ndarray] = []
        self._tri_fuzz: list[np.ndarray] = []
        self._tri_ior: list[np.ndarray] = []

    def _push(
        self, center, radius, kind, albedo, fuzz, ior,
        tex_kind=TextureKind.SOLID, albedo2=(0.0, 0.0, 0.0),
        tex_inv_scale=0.0, tex_id=0,
    ) -> "SceneBuilder":
        self._centers.append(tuple(float(c) for c in center))
        self._radii.append(float(radius))
        self._kind.append(int(kind))
        self._albedo.append(tuple(float(a) for a in albedo))
        self._fuzz.append(float(fuzz))
        self._ior.append(float(ior))
        self._tex_kind.append(int(tex_kind))
        self._albedo2.append(tuple(float(a) for a in albedo2))
        self._tex_inv_scale.append(float(tex_inv_scale))
        self._tex_id.append(int(tex_id))
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

    def add_checker_sphere(
        self, center, radius, scale, even_albedo, odd_albedo
    ) -> "SceneBuilder":
        """Lambertian sphere with an RTiOW book-2 checker texture: parity of
        ``floor(p/scale)`` summed over xyz picks even/odd, sampled at the 3D
        hit point. ``1/scale`` is rounded to the nearest f16-representable
        value so the pallas kernel's 16-bit packing reproduces the XLA path
        exactly."""
        inv = float(np.float32(np.float16(1.0 / float(scale))))
        return self._push(
            center, radius, MaterialKind.LAMBERTIAN, even_albedo, 0.0, 1.0,
            tex_kind=TextureKind.CHECKER, albedo2=odd_albedo,
            tex_inv_scale=inv,
        )

    def add_image_sphere(self, center, radius, image) -> "SceneBuilder":
        """Lambertian sphere textured by an image (RTiOW book-2
        image_texture): sphere UV from the outward unit normal, nearest
        texel, linear color = byte/255 (no de-gamma -- matching the book's
        stb byte read).

        ``image``: (H, W, 3) uint8 or float array (floats taken as [0,1]).
        """
        img = np.asarray(image)
        if img.ndim != 3 or img.shape[2] < 3:
            raise ValueError(f"expected (H, W, 3) image, got {img.shape}")
        img = img[:, :, :3]
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        else:
            img = np.clip(img.astype(np.float32), 0.0, 1.0)
        tex_id = len(self._textures)
        self._textures.append(img)
        return self._push(
            center, radius, MaterialKind.LAMBERTIAN, (1.0, 1.0, 1.0), 0.0,
            1.0, tex_kind=TextureKind.IMAGE, tex_id=tex_id,
        )

    def add_mesh(
        self, vertices, faces, *, albedo=(1.0, 1.0, 1.0),
        kind: "MaterialKind" = None, fuzz: float = 0.0, ior: float = 1.5,
    ) -> "SceneBuilder":
        """Triangle mesh: (V,3) vertices + (F,3) integer faces, one material
        for the whole primitive (denormalized to per-triangle columns).
        ``kind`` defaults to LAMBERTIAN."""
        from . import mesh as _mesh

        kind = MaterialKind.LAMBERTIAN if kind is None else kind
        v0, e1, e2 = _mesh.faces_to_soa(vertices, faces)
        m = v0.shape[0]
        self._tri_v0.append(v0)
        self._tri_e1.append(e1)
        self._tri_e2.append(e2)
        self._tri_kind.append(np.full(m, int(kind), np.int32))
        alb = (
            (1.0, 1.0, 1.0) if kind == MaterialKind.DIELECTRIC else albedo
        )
        self._tri_albedo.append(
            np.tile(np.asarray(alb, np.float32), (m, 1))
        )
        self._tri_fuzz.append(np.full(m, float(fuzz), np.float32))
        self._tri_ior.append(np.full(m, float(ior), np.float32))
        return self

    def add_gltf(
        self, path, *, scale: float = 1.0, translate=(0.0, 0.0, 0.0)
    ) -> "SceneBuilder":
        """Load every triangle primitive from a .gltf/.glb file
        (scene/gltf.py), mapping pbrMetallicRoughness onto this framework's
        materials (metallic -> metal with fuzz = roughness, else
        lambertian)."""
        from . import gltf as _gltf

        t = np.asarray(translate, np.float32)
        for prim in _gltf.load_gltf(path):
            self.add_mesh(
                prim.vertices * np.float32(scale) + t,
                prim.faces,
                albedo=prim.albedo,
                kind=MaterialKind.METALLIC if prim.metallic
                else MaterialKind.LAMBERTIAN,
                fuzz=prim.fuzz,
            )
        return self

    def __len__(self) -> int:
        return len(self._radii)

    def _texture_stack(self) -> tuple[np.ndarray, np.ndarray]:
        """Stack textures padded to common dims; returns (stack, per-sphere
        (w, h))."""
        if not self._textures:
            stack = np.ones((1, 1, 1, 3), np.float32)
            wh = np.zeros((len(self._radii), 2), np.int32)
            return stack, wh
        th = max(t.shape[0] for t in self._textures)
        tw = max(t.shape[1] for t in self._textures)
        stack = np.zeros((len(self._textures), th, tw, 3), np.float32)
        for i, t in enumerate(self._textures):
            stack[i, : t.shape[0], : t.shape[1]] = t
        wh = np.array(
            [
                (
                    self._textures[tid].shape[1],
                    self._textures[tid].shape[0],
                )
                if tk == TextureKind.IMAGE
                else (0, 0)
                for tk, tid in zip(self._tex_kind, self._tex_id)
            ],
            np.int32,
        )
        return stack, wh

    def _triangle_pack(self) -> dict:
        """Concatenate meshes, build the BVH, permute to leaf order."""
        from . import mesh as _mesh

        if not self._tri_v0:
            z3 = jnp.zeros((0, 3), jnp.float32)
            z1 = jnp.zeros((0,), jnp.float32)
            zi = jnp.zeros((0,), jnp.int32)
            one_node = jnp.zeros((1, 3), jnp.float32)
            return dict(
                tri_v0=z3, tri_e1=z3, tri_e2=z3, tri_mat_kind=zi,
                tri_albedo=z3, tri_fuzz=z1, tri_ior=z1,
                bvh_min=one_node, bvh_max=one_node,
                bvh_skip=jnp.ones((1,), jnp.int32),
                bvh_first=jnp.zeros((1,), jnp.int32),
                bvh_count=jnp.zeros((1,), jnp.int32),
                has_triangles=False,
            )
        v0 = np.concatenate(self._tri_v0)
        e1 = np.concatenate(self._tri_e1)
        e2 = np.concatenate(self._tri_e2)
        kind = np.concatenate(self._tri_kind)
        albedo = np.concatenate(self._tri_albedo)
        fuzz = np.concatenate(self._tri_fuzz)
        ior = np.concatenate(self._tri_ior)
        bvh = _mesh.build_bvh(v0, e1, e2)
        o = bvh.order
        return dict(
            tri_v0=jnp.asarray(v0[o]), tri_e1=jnp.asarray(e1[o]),
            tri_e2=jnp.asarray(e2[o]),
            tri_mat_kind=jnp.asarray(kind[o]),
            tri_albedo=jnp.asarray(albedo[o]),
            tri_fuzz=jnp.asarray(fuzz[o]), tri_ior=jnp.asarray(ior[o]),
            bvh_min=jnp.asarray(bvh.node_min),
            bvh_max=jnp.asarray(bvh.node_max),
            bvh_skip=jnp.asarray(bvh.skip),
            bvh_first=jnp.asarray(bvh.first),
            bvh_count=jnp.asarray(bvh.count),
            has_triangles=True,
        )

    def build(self) -> Scene:
        tri = self._triangle_pack()
        if not self._radii:
            # Sphere-less world: rays shade sky (core.cc:254-256) unless a
            # mesh is present. Explicit zero-size sphere representation.
            z3 = jnp.zeros((0, 3), jnp.float32)
            z1 = jnp.zeros((0,), jnp.float32)
            zi = jnp.zeros((0,), jnp.int32)
            return Scene(
                z3, z1, zi, z3, z1, z1,
                tex_kind=zi, albedo2=z3, tex_inv_scale=z1, tex_id=zi,
                tex_wh=jnp.zeros((0, 2), jnp.int32),
                textures=jnp.ones((1, 1, 1, 3), jnp.float32),
                has_textures=False,
                **tri,
            )
        stack, wh = self._texture_stack()
        return Scene(
            centers=jnp.asarray(np.array(self._centers, np.float32)),
            radii=jnp.asarray(np.array(self._radii, np.float32)),
            mat_kind=jnp.asarray(np.array(self._kind, np.int32)),
            albedo=jnp.asarray(np.array(self._albedo, np.float32)),
            fuzz=jnp.asarray(np.array(self._fuzz, np.float32)),
            ior=jnp.asarray(np.array(self._ior, np.float32)),
            tex_kind=jnp.asarray(np.array(self._tex_kind, np.int32)),
            albedo2=jnp.asarray(np.array(self._albedo2, np.float32)),
            tex_inv_scale=jnp.asarray(np.array(self._tex_inv_scale, np.float32)),
            tex_id=jnp.asarray(np.array(self._tex_id, np.int32)),
            tex_wh=jnp.asarray(wh),
            textures=jnp.asarray(stack),
            has_textures=any(
                tk != TextureKind.SOLID for tk in self._tex_kind
            ),
            **tri,
        )

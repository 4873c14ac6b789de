"""World/scene configuration: JSON schema + procedural cover-scene builder.

Equivalent of the reference's reflect-cpp config system
(``/root/reference/src/ray.tracer.core.cc:47-149``):

- ``WorldDefinition``: same fields and in-code defaults as the C++ struct
  (``core.cc:67-95``); ``load_world`` reads the same JSON layout as the
  shipped ``data/config/world.config.json`` including the
  ``{"material_def": "<TypeName>", ...}`` tagged-union encoding produced by
  ``rfl::TaggedUnion<"material_def", AlbedoMatDef, DielectricMatDef,
  MetallicMatDef>`` (``core.cc:65``).
- ``build_world``: the explicit object list + random a x b sphere grid of
  ``make_world_spheres`` (``core.cc:99-149``).
- ``make_world_basic``: the two-sphere test scene (``core.cc:20-45``; dead
  code in the reference -- kept here because it is the natural golden-test
  scene).

Reference-behavior quirk (SURVEY.md section 2C quirk 1): ``core.cc:130`` calls
``glm::vec3::length()`` which returns the component COUNT (3), not the norm,
so the "grid sphere too close to the big spheres" filter never rejects and
every one of the (a_max-a_min) x (b_max-b_min) grid spheres is placed. By
default we reproduce that behavior (``apply_center_filter=False`` => 22x22
grid + 4 fixed = 488 spheres with the shipped config) so performance and
images are comparable with the reference binary; pass
``apply_center_filter=True`` for the RTiOW-intended filter
(``norm(center - center_offset) > center_dist_treshold``).

Scene-grid randomness uses a seeded numpy Generator (host-side, build-time
only): the reference uses an unseeded mt19937 (``random.number.gen.hpp:46``)
so its scene is different every run; a fixed default seed makes ours
reproducible while ``seed=None`` restores reference behavior.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Sequence

import numpy as np

from ..core.camera import CameraParameters
from .types import Scene, SceneBuilder

DEFAULT_GRID_SEED = 20260816


@dataclasses.dataclass(frozen=True)
class SphereDef:
    """``core.cc:47-50``."""

    center: tuple[float, float, float]
    radius: float


@dataclasses.dataclass(frozen=True)
class AlbedoMatDef:
    """Lambertian material def (``core.cc:52-54``)."""

    albedo: tuple[float, float, float]


@dataclasses.dataclass(frozen=True)
class DielectricMatDef:
    """``core.cc:56-58``."""

    refindex: float


@dataclasses.dataclass(frozen=True)
class MetallicMatDef:
    """``core.cc:60-63``. Field spelled ``fuzzines`` to stay JSON-compatible."""

    albedo: tuple[float, float, float]
    fuzzines: float


@dataclasses.dataclass(frozen=True)
class CheckerMatDef:
    """EXTENSION beyond the reference's schema (its texturing intent is
    vendored-unused -- SURVEY.md section 2M): RTiOW book-2 checker texture on
    a lambertian sphere."""

    scale: float
    even_albedo: tuple[float, float, float]
    odd_albedo: tuple[float, float, float]


@dataclasses.dataclass(frozen=True)
class ImageMatDef:
    """EXTENSION: image-textured lambertian sphere; ``file`` is a PNG path
    (resolved against the config file's directory at load time)."""

    file: str


MaterialDef = (
    AlbedoMatDef | DielectricMatDef | MetallicMatDef | CheckerMatDef
    | ImageMatDef
)

_MATERIAL_DEF_TAGS = {
    "AlbedoMatDef": AlbedoMatDef,
    "DielectricMatDef": DielectricMatDef,
    "MetallicMatDef": MetallicMatDef,
    "CheckerMatDef": CheckerMatDef,
    "ImageMatDef": ImageMatDef,
}


@dataclasses.dataclass(frozen=True)
class WorldDefinition:
    """Scene + camera config; defaults == ``core.cc:67-95``."""

    camera: CameraParameters = CameraParameters()
    a_min: int = -11
    a_max: int = 11
    b_min: int = -11
    b_max: int = 11
    center: tuple[float, float, float] = (0.2, 0.9, 0.2)
    center_offset: tuple[float, float, float] = (4.0, 0.2, 0.0)
    center_dist_treshold: float = 0.9
    diffuse_material_treshold: float = 0.85
    metal_material_treshold: float = 0.95
    objects: tuple[tuple[SphereDef, MaterialDef], ...] = (
        (SphereDef((0.0, -1000.0, 0.0), 1000.0), AlbedoMatDef((0.5, 0.5, 0.5))),
        (SphereDef((0.0, 1.0, 0.0), 1.0), DielectricMatDef(1.5)),
        (SphereDef((-4.0, -1.0, 0.0), 1.0), AlbedoMatDef((0.4, 0.2, 0.1))),
        (SphereDef((4.0, -1.0, 0.0), 1.0), AlbedoMatDef((0.7, 0.6, 0.5))),
    )


def _parse_material_def(
    obj: dict[str, Any], base_dir: pathlib.Path | None = None
) -> MaterialDef:
    """Decode the rfl tagged-union encoding (``core.cc:65``)."""
    tag = obj["material_def"]
    cls = _MATERIAL_DEF_TAGS.get(tag)
    if cls is None:
        raise ValueError(f"unknown material_def tag: {tag!r}")
    if cls is AlbedoMatDef:
        return AlbedoMatDef(tuple(float(x) for x in obj["albedo"]))
    if cls is DielectricMatDef:
        return DielectricMatDef(float(obj["refindex"]))
    if cls is CheckerMatDef:
        return CheckerMatDef(
            float(obj["scale"]),
            tuple(float(x) for x in obj["even_albedo"]),
            tuple(float(x) for x in obj["odd_albedo"]),
        )
    if cls is ImageMatDef:
        f = pathlib.Path(obj["file"])
        if base_dir is not None and not f.is_absolute():
            f = base_dir / f
        return ImageMatDef(str(f))
    return MetallicMatDef(
        tuple(float(x) for x in obj["albedo"]), float(obj["fuzzines"])
    )


def material_def_to_json(mat: MaterialDef) -> dict[str, Any]:
    if isinstance(mat, AlbedoMatDef):
        return {"material_def": "AlbedoMatDef", "albedo": list(mat.albedo)}
    if isinstance(mat, DielectricMatDef):
        return {"material_def": "DielectricMatDef", "refindex": mat.refindex}
    if isinstance(mat, CheckerMatDef):
        return {
            "material_def": "CheckerMatDef",
            "scale": mat.scale,
            "even_albedo": list(mat.even_albedo),
            "odd_albedo": list(mat.odd_albedo),
        }
    if isinstance(mat, ImageMatDef):
        return {"material_def": "ImageMatDef", "file": mat.file}
    return {
        "material_def": "MetallicMatDef",
        "albedo": list(mat.albedo),
        "fuzzines": mat.fuzzines,
    }


def world_from_dict(
    data: dict[str, Any], base_dir: pathlib.Path | None = None
) -> WorldDefinition:
    """Build a WorldDefinition from parsed JSON, applying reference defaults
    for absent fields (reflect-cpp fills from struct initializers).
    ``base_dir`` resolves relative ImageMatDef texture paths."""
    defaults = WorldDefinition()
    cam_raw = data.get("camera", {})
    cam_defaults = defaults.camera
    camera = CameraParameters(
        aspect_ratio=float(cam_raw.get("aspect_ratio", cam_defaults.aspect_ratio)),
        image_width=int(cam_raw.get("image_width", cam_defaults.image_width)),
        samples_per_pixel=int(
            cam_raw.get("samples_per_pixel", cam_defaults.samples_per_pixel)
        ),
        max_depth=int(cam_raw.get("max_depth", cam_defaults.max_depth)),
        vertical_fov=float(cam_raw.get("vertical_fov", cam_defaults.vertical_fov)),
        defocus_angle=float(cam_raw.get("defocus_angle", cam_defaults.defocus_angle)),
        focus_distance=float(
            cam_raw.get("focus_distance", cam_defaults.focus_distance)
        ),
        lookfrom=tuple(float(x) for x in cam_raw.get("lookfrom", cam_defaults.lookfrom)),
        lookat=tuple(float(x) for x in cam_raw.get("lookat", cam_defaults.lookat)),
        world_up=tuple(float(x) for x in cam_raw.get("world_up", cam_defaults.world_up)),
    )

    objects: list[tuple[SphereDef, MaterialDef]] = []
    if "objects" in data:
        for sphere_raw, mat_raw in data["objects"]:
            objects.append(
                (
                    SphereDef(
                        tuple(float(x) for x in sphere_raw["center"]),
                        float(sphere_raw["radius"]),
                    ),
                    _parse_material_def(mat_raw, base_dir),
                )
            )
    else:
        objects = list(defaults.objects)

    def _vec3(name: str, fallback):
        return tuple(float(x) for x in data.get(name, fallback))

    return WorldDefinition(
        camera=camera,
        a_min=int(data.get("a_min", defaults.a_min)),
        a_max=int(data.get("a_max", defaults.a_max)),
        b_min=int(data.get("b_min", defaults.b_min)),
        b_max=int(data.get("b_max", defaults.b_max)),
        center=_vec3("center", defaults.center),
        center_offset=_vec3("center_offset", defaults.center_offset),
        center_dist_treshold=float(
            data.get("center_dist_treshold", defaults.center_dist_treshold)
        ),
        diffuse_material_treshold=float(
            data.get("diffuse_material_treshold", defaults.diffuse_material_treshold)
        ),
        metal_material_treshold=float(
            data.get("metal_material_treshold", defaults.metal_material_treshold)
        ),
        objects=tuple(objects),
    )


def load_world(path: str | pathlib.Path) -> WorldDefinition:
    """JSON file -> WorldDefinition (== ``rfl::json::load`` at ``core.cc:102``)."""
    path = pathlib.Path(path)
    with open(path, "r", encoding="utf-8") as f:
        return world_from_dict(json.load(f), base_dir=path.parent)


def _add_explicit_objects(builder: SceneBuilder, objects: Sequence[tuple[SphereDef, MaterialDef]]) -> None:
    """The rfl::visit material dispatch of ``core.cc:104-122`` (+ the
    texture extension defs)."""
    for sphere, mat in objects:
        if isinstance(mat, AlbedoMatDef):
            builder.add_lambertian_sphere(sphere.center, sphere.radius, mat.albedo)
        elif isinstance(mat, DielectricMatDef):
            builder.add_dielectric_sphere(sphere.center, sphere.radius, mat.refindex)
        elif isinstance(mat, MetallicMatDef):
            builder.add_metallic_sphere(
                sphere.center, sphere.radius, mat.albedo, mat.fuzzines
            )
        elif isinstance(mat, CheckerMatDef):
            builder.add_checker_sphere(
                sphere.center, sphere.radius, mat.scale, mat.even_albedo,
                mat.odd_albedo,
            )
        elif isinstance(mat, ImageMatDef):
            from ..utils import png as _png

            builder.add_image_sphere(
                sphere.center, sphere.radius, _png.read_png(mat.file)
            )
        else:  # pragma: no cover
            raise TypeError(f"unknown material def: {mat!r}")


def build_world(
    world: WorldDefinition,
    *,
    seed: int | None = DEFAULT_GRID_SEED,
    apply_center_filter: bool = False,
    extra=None,
) -> tuple[CameraParameters, Scene]:
    """``make_world_spheres`` (``core.cc:99-149``): explicit objects plus the
    random grid of small spheres.

    Grid semantics (``core.cc:125-146``), reproduced exactly:
      - per cell (a, b): ``choose_mat = U[0,1)``, then
        ``center = (a + 0.9*U, 0.2, b + 0.9*U)`` -- note the reference
        HARDCODES the 0.2 height, 0.9 jitter, and 0.2 radius; the config's
        ``center`` field is loaded but unused. Same here.
      - material thresholds: diffuse below ``diffuse_material_treshold``
        (albedo = U3[0,1) * U3[0,1)); metal below ``metal_material_treshold``
        (albedo = U3[0.5,1), fuzz = U[0,0.5)); else dielectric with
        ior = U[1.2,1.6) -- the reference deviates from RTiOW's fixed 1.5.
      - ``apply_center_filter``: see module docstring (reference behavior is
        False due to the ``.length()`` quirk at ``core.cc:130``).

    RNG draw ORDER matches the reference exactly (choose_mat, then the two
    center jitters, then material params) so a fixed seed gives one coherent
    scene; values are numpy PCG64 rather than mt19937 (distribution-equal).
    """
    builder = SceneBuilder()
    _add_explicit_objects(builder, world.objects)

    rand = np.random.default_rng(seed)
    offset = np.asarray(world.center_offset, np.float32)

    for a in range(world.a_min, world.a_max):
        for b in range(world.b_min, world.b_max):
            choose_mat = rand.random()
            center = np.array(
                [a + 0.9 * rand.random(), 0.2, b + 0.9 * rand.random()], np.float32
            )

            if apply_center_filter:
                placed = float(np.linalg.norm(center - offset)) > world.center_dist_treshold
            else:
                # Reference behavior: vec3::length() == 3 > threshold, always true.
                placed = True
            if not placed:
                continue

            if choose_mat < world.diffuse_material_treshold:
                albedo = rand.random(3) * rand.random(3)
                builder.add_lambertian_sphere(center, 0.2, albedo)
            elif choose_mat < world.metal_material_treshold:
                albedo = 0.5 + 0.5 * rand.random(3)
                fuzz = 0.5 * rand.random()
                builder.add_metallic_sphere(center, 0.2, albedo, fuzz)
            else:
                ior = 1.2 + 0.4 * rand.random()
                builder.add_dielectric_sphere(center, 0.2, ior)

    if extra is not None:
        # Caller hook to extend the configured world (e.g. the CLI's
        # --gltf assets) before packing -- the builder is the one place
        # spheres, textures and triangle meshes compose.
        extra(builder)
    return world.camera, builder.build()


def make_world_basic() -> tuple[CameraParameters, Scene]:
    """Two-sphere test scene (``core.cc:20-45``; dead in the reference)."""
    r = float(np.cos(np.pi * 0.25))
    builder = SceneBuilder()
    builder.add_lambertian_sphere((-r, 0.0, -1.0), r, (0.0, 0.0, 1.0))
    builder.add_lambertian_sphere((r, 0.0, -1.0), r, (1.0, 0.0, 0.0))
    camera = CameraParameters(
        aspect_ratio=16.0 / 9.0,
        image_width=800,
        samples_per_pixel=100,
        max_depth=50,
        vertical_fov=20.0,
        defocus_angle=10.0,
        focus_distance=3.4,
        lookfrom=(-2.0, 2.0, 1.0),
        lookat=(0.0, 0.0, -1.0),
        world_up=(0.0, 1.0, 0.0),
    )
    return camera, builder.build()


def make_world_stress(
    n_spheres: int = 2048,
    *,
    seed: int = 0,
    image_width: int = 1200,
) -> tuple[CameraParameters, Scene]:
    """Procedural N-sphere stress scene (goes beyond the reference's fixed
    488-sphere cover scene; used to characterize throughput scaling with
    scene size -- the sweep is O(N) per ray segment).

    A ground sphere plus ``n_spheres - 1`` small spheres jittered on a
    square grid, 70/20/10 lambertian/metal/dielectric, with a camera pulled
    back to frame the whole field.
    """
    rng = np.random.default_rng(seed)
    builder = SceneBuilder()
    builder.add_lambertian_sphere((0.0, -1000.0, 0.0), 1000.0, (0.5, 0.5, 0.5))
    side = int(np.ceil(np.sqrt(max(n_spheres - 1, 1))))
    placed = 0
    for i in range(side):
        for j in range(side):
            if placed >= n_spheres - 1:
                break
            x = (i - side / 2) * 1.2 + rng.uniform(-0.4, 0.4)
            z = (j - side / 2) * 1.2 + rng.uniform(-0.4, 0.4)
            r = rng.uniform(0.15, 0.3)
            center = (x, r, z)
            m = rng.uniform()
            if m < 0.7:
                builder.add_lambertian_sphere(
                    center, r, tuple(rng.uniform(0.0, 1.0, 3))
                )
            elif m < 0.9:
                builder.add_metallic_sphere(
                    center, r, tuple(rng.uniform(0.5, 1.0, 3)),
                    rng.uniform(0.0, 0.4),
                )
            else:
                builder.add_dielectric_sphere(center, r, 1.5)
            placed += 1
    camera = CameraParameters(
        aspect_ratio=16.0 / 9.0,
        image_width=image_width,
        samples_per_pixel=8,
        max_depth=8,
        vertical_fov=20.0,
        defocus_angle=0.0,
        focus_distance=side * 1.2,
        lookfrom=(side * 0.9, side * 0.25, side * 0.9),
        lookat=(0.0, 0.0, 0.0),
        world_up=(0.0, 1.0, 0.0),
    )
    return camera, builder.build()


def make_procedural_earth(size: int = 64, seed: int = 7) -> np.ndarray:
    """A self-contained (size, size, 3) float32 'planet' texture (the
    environment ships no image assets): latitude-banded ocean/land from
    smoothed value noise, polar caps."""
    rng = np.random.default_rng(seed)
    coarse = rng.random((9, 9))
    yy, xx = np.mgrid[0:size, 0:size] / (size - 1)
    # Bilinear upsample of the coarse noise (wrap horizontally: u is seam-
    # continuous on the sphere).
    gx = xx * 8
    gy = yy * 8
    x0 = np.floor(gx).astype(int)
    y0 = np.floor(gy).astype(int)
    fx = gx - x0
    fy = gy - y0
    x1 = np.minimum(x0 + 1, 8) % 8
    y1 = np.minimum(y0 + 1, 8)
    n = (
        coarse[y0, x0 % 8] * (1 - fx) * (1 - fy)
        + coarse[y0, x1] * fx * (1 - fy)
        + coarse[y1, x0 % 8] * (1 - fx) * fy
        + coarse[y1, x1] * fx * fy
    )
    land = n > 0.55
    img = np.empty((size, size, 3), np.float32)
    img[...] = (0.05, 0.15, 0.45)                      # ocean
    img[land] = (0.15, 0.45, 0.12)                     # land
    polar = (yy < 0.12) | (yy > 0.88)
    img[polar] = (0.9, 0.92, 0.95)                     # ice caps
    return img


def make_world_textured(
    *, image_width: int = 1200, earth_size: int = 64
) -> tuple[CameraParameters, Scene]:
    """BASELINE.json configs[2]: checker + image-textured spheres with a
    defocus camera (the reference's unrealized texturing intent --
    SURVEY.md section 2M; semantics per ops/texture.py)."""
    builder = SceneBuilder()
    builder.add_checker_sphere(
        (0.0, -1000.0, 0.0), 1000.0, 0.8, (0.2, 0.3, 0.1), (0.9, 0.9, 0.9)
    )
    builder.add_image_sphere(
        (0.0, 1.0, 0.0), 1.0, make_procedural_earth(earth_size)
    )
    builder.add_dielectric_sphere((-2.5, 1.0, 1.0), 1.0, 1.5)
    builder.add_metallic_sphere((2.5, 1.0, -0.5), 1.0, (0.7, 0.6, 0.5), 0.05)
    builder.add_checker_sphere(
        (1.2, 0.35, 1.8), 0.35, 0.12, (0.8, 0.1, 0.1), (0.95, 0.85, 0.2)
    )
    camera = CameraParameters(
        aspect_ratio=16.0 / 9.0,
        image_width=image_width,
        samples_per_pixel=64,
        max_depth=16,
        vertical_fov=25.0,
        defocus_angle=0.8,
        focus_distance=9.0,
        lookfrom=(7.0, 2.2, 5.5),
        lookat=(0.0, 0.9, 0.0),
        world_up=(0.0, 1.0, 0.0),
    )
    return camera, builder.build()


def make_world_mesh(
    *, image_width: int = 1200, subdivisions: int = 3,
    gltf_path: str | pathlib.Path | None = None,
) -> tuple[CameraParameters, Scene]:
    """BASELINE.json configs[3]: a triangle-mesh scene with BVH
    build + traversal. Loads ``gltf_path`` when given; otherwise uses a
    procedural icosphere mesh (20 * 4^subdivisions triangles; default 1280)
    so the benchmark is self-contained."""
    from .types import MaterialKind

    builder = SceneBuilder()
    builder.add_checker_sphere(
        (0.0, -1000.0, 0.0), 1000.0, 0.8, (0.35, 0.35, 0.35), (0.15, 0.15, 0.2)
    )
    if gltf_path is not None:
        builder.add_gltf(gltf_path, translate=(0.0, 1.0, 0.0))
    else:
        from . import mesh as _mesh

        verts, faces = _mesh.make_icosphere(subdivisions)
        builder.add_mesh(
            verts + np.float32([0.0, 1.0, 0.0]), faces,
            albedo=(0.75, 0.55, 0.25), kind=MaterialKind.METALLIC, fuzz=0.08,
        )
    builder.add_dielectric_sphere((-2.4, 0.8, 1.2), 0.8, 1.5)
    builder.add_lambertian_sphere((2.4, 0.8, -0.6), 0.8, (0.2, 0.35, 0.65))
    camera = CameraParameters(
        aspect_ratio=16.0 / 9.0,
        image_width=image_width,
        samples_per_pixel=64,
        max_depth=16,
        vertical_fov=28.0,
        defocus_angle=0.0,
        focus_distance=8.0,
        lookfrom=(6.0, 2.4, 5.0),
        lookat=(0.0, 0.9, 0.0),
        world_up=(0.0, 1.0, 0.0),
    )
    return camera, builder.build()


def make_world_meshes(
    k: int = 4,
    *,
    image_width: int = 1200,
    subdivisions: int = 2,
) -> tuple[CameraParameters, Scene]:
    """Multi-object mesh scene: ``k`` separated icosphere instances
    (20 * 4^subdivisions triangles each) interleaved with OCCLUDING
    spheres in front of half of them.

    This is the workload the per-block triangle cull + cross-primitive
    cull seeding (RT_CULL / RT_CULL_HINT) were built for: single-icosphere
    benches (``mesh:S``) have nothing to skip on open rays -- here, rays
    that hit an occluder sphere strictly closer stop voting that mesh's
    Morton blocks open, so whole objects drop out of the triangle sweep.
    Exact-closest-hit parity over multiple objects matches the reference's
    linear collection scan (``/root/reference/src/ray.tracer.object.defs.cc:
    68-81``) -- capability, not architecture.
    """
    from . import mesh as _mesh
    from .types import MaterialKind

    builder = SceneBuilder()
    builder.add_checker_sphere(
        (0.0, -1000.0, 0.0), 1000.0, 0.8, (0.35, 0.35, 0.35), (0.15, 0.15, 0.2)
    )
    verts, faces = _mesh.make_icosphere(subdivisions)
    palette = [
        ((0.75, 0.55, 0.25), MaterialKind.METALLIC, 0.08),
        ((0.3, 0.55, 0.8), MaterialKind.LAMBERTIAN, 0.0),
        ((0.8, 0.3, 0.3), MaterialKind.METALLIC, 0.2),
        ((0.5, 0.8, 0.4), MaterialKind.LAMBERTIAN, 0.0),
    ]
    span = 2.6
    for i in range(k):
        x = (i - (k - 1) / 2.0) * span
        albedo, kind, fuzz = palette[i % len(palette)]
        builder.add_mesh(
            verts + np.float32([x, 1.0, 0.0]), faces,
            albedo=albedo, kind=kind, fuzz=fuzz,
        )
        if i % 2 == 0:
            # Occluder: a sphere on the camera->mesh line, strictly closer,
            # big enough to shadow most of that instance's primary rays.
            builder.add_metallic_sphere(
                (x * 0.72, 0.85, 2.1), 0.85, (0.7, 0.65, 0.6), 0.05
            )
    builder.add_dielectric_sphere(((k / 2.0) * span - 0.4, 0.7, 3.2), 0.7, 1.5)
    camera = CameraParameters(
        aspect_ratio=16.0 / 9.0,
        image_width=image_width,
        samples_per_pixel=64,
        max_depth=16,
        vertical_fov=30.0,
        defocus_angle=0.0,
        focus_distance=9.0,
        lookfrom=(0.0, 2.6, 9.0),
        lookat=(0.0, 0.9, 0.0),
        world_up=(0.0, 1.0, 0.0),
    )
    return camera, builder.build()


def load_and_build(
    path: str | pathlib.Path,
    *,
    seed: int | None = DEFAULT_GRID_SEED,
    apply_center_filter: bool = False,
) -> tuple[CameraParameters, Scene]:
    """JSON config file -> (camera, scene); the ``default_setup`` entry flow
    (``core.cc:171-172``)."""
    return build_world(
        load_world(path), seed=seed, apply_center_filter=apply_center_filter
    )

"""Scene config system: JSON parity with the reference's reflect-cpp schema
(core.cc:47-149) and cover-scene build semantics."""

import json
import pathlib

import numpy as np

from raytracing_tpu.core.camera import CameraParameters
from raytracing_tpu.scene import config as sconfig
from raytracing_tpu.scene.types import MaterialKind, SceneBuilder

CONFIG = pathlib.Path(__file__).resolve().parents[1] / "data/config/world.config.json"


def test_load_shipped_config_values():
    world = sconfig.load_world(CONFIG)
    cam = world.camera
    assert cam.image_width == 1200
    assert cam.samples_per_pixel == 8          # world.config.json overrides 100
    assert cam.max_depth == 8
    assert cam.aspect_ratio == 1.7
    assert cam.image_height == 705             # trunc(1200/1.7)
    assert cam.lookfrom == (13.0, 2.0, 3.0)
    assert cam.defocus_angle == 0.6
    assert world.diffuse_material_treshold == 0.8
    assert world.metal_material_treshold == 0.95
    assert len(world.objects) == 4
    ground, glass = world.objects[0], world.objects[1]
    assert ground[0].radius == 1000.0
    assert isinstance(ground[1], sconfig.AlbedoMatDef)
    assert isinstance(glass[1], sconfig.DielectricMatDef)
    assert glass[1].refindex == 1.5


def test_defaults_match_reference_struct():
    """Absent JSON fields fall back to the C++ struct initializers
    (core.cc:67-95)."""
    world = sconfig.world_from_dict({})
    assert world.camera.image_width == 1200
    assert world.camera.samples_per_pixel == 100
    assert world.camera.max_depth == 50
    assert world.camera.lookfrom == (-2.0, 2.0, 1.0)
    assert world.a_min == -11 and world.b_max == 11
    assert world.diffuse_material_treshold == 0.85
    assert len(world.objects) == 4


def test_material_def_tagged_union_roundtrip():
    mats = [
        sconfig.AlbedoMatDef((0.1, 0.2, 0.3)),
        sconfig.DielectricMatDef(1.33),
        sconfig.MetallicMatDef((0.9, 0.8, 0.7), 0.25),
    ]
    for m in mats:
        encoded = sconfig.material_def_to_json(m)
        assert "material_def" in encoded
        decoded = sconfig._parse_material_def(json.loads(json.dumps(encoded)))
        assert decoded == m


def test_cover_scene_places_all_grid_spheres_by_default():
    """Reference behavior quirk (core.cc:130): the distance filter is a no-op,
    so 22*22 grid + 4 explicit = 488 spheres."""
    world = sconfig.load_world(CONFIG)
    _, scene = sconfig.build_world(world, seed=1)
    assert scene.num_objects == 4 + 22 * 22 == 488


def test_cover_scene_center_filter_intent():
    """apply_center_filter=True applies the RTiOW-intended rejection near the
    big spheres: strictly fewer objects."""
    world = sconfig.load_world(CONFIG)
    _, filtered = sconfig.build_world(world, seed=1, apply_center_filter=True)
    assert 4 < filtered.num_objects < 488


def test_cover_scene_material_mix_and_params():
    world = sconfig.load_world(CONFIG)
    _, scene = sconfig.build_world(world, seed=3)
    kinds = np.asarray(scene.mat_kind)
    grid = kinds[4:]
    n = len(grid)
    frac_lam = (grid == MaterialKind.LAMBERTIAN).mean()
    frac_met = (grid == MaterialKind.METALLIC).mean()
    frac_die = (grid == MaterialKind.DIELECTRIC).mean()
    # Thresholds 0.8 / 0.95 (shipped config); 3-sigma binomial bounds at n=484.
    assert abs(frac_lam - 0.80) < 3 * np.sqrt(0.8 * 0.2 / n)
    assert abs(frac_met - 0.15) < 3 * np.sqrt(0.15 * 0.85 / n)
    assert abs(frac_die - 0.05) < 3 * np.sqrt(0.05 * 0.95 / n)
    # Grid sphere geometry: radius 0.2, height 0.2 (hardcoded, core.cc:128,143).
    radii = np.asarray(scene.radii)[4:]
    np.testing.assert_allclose(radii, 0.2, atol=1e-6)
    centers = np.asarray(scene.centers)[4:]
    np.testing.assert_allclose(centers[:, 1], 0.2, atol=1e-6)
    # Metal fuzz in [0, 0.5); dielectric ior in [1.2, 1.6) (core.cc:137-140).
    fuzz = np.asarray(scene.fuzz)[4:][grid == MaterialKind.METALLIC]
    assert (fuzz >= 0).all() and (fuzz < 0.5).all()
    ior = np.asarray(scene.ior)[4:][grid == MaterialKind.DIELECTRIC]
    assert (ior >= 1.2).all() and (ior < 1.6).all()
    # Dielectric packs albedo 1 (unit attenuation, material.defs.cc:80).
    alb = np.asarray(scene.albedo)[4:][grid == MaterialKind.DIELECTRIC]
    np.testing.assert_allclose(alb, 1.0, atol=0)


def test_cover_scene_seeded_reproducible():
    world = sconfig.load_world(CONFIG)
    _, s1 = sconfig.build_world(world, seed=7)
    _, s2 = sconfig.build_world(world, seed=7)
    np.testing.assert_array_equal(np.asarray(s1.centers), np.asarray(s2.centers))
    _, s3 = sconfig.build_world(world, seed=8)
    assert not np.array_equal(np.asarray(s1.centers), np.asarray(s3.centers))


def test_make_world_basic():
    cam, scene = sconfig.make_world_basic()
    assert scene.num_objects == 2
    r = float(np.cos(np.pi / 4))
    np.testing.assert_allclose(np.asarray(scene.radii), [r, r], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(scene.centers), [[-r, 0, -1], [r, 0, -1]], atol=1e-6
    )
    assert cam.image_width == 800


def test_builder_empty_scene():
    scene = SceneBuilder().build()
    assert scene.num_objects == 0


def test_camera_parameters_json_compat_with_reference_field_names():
    """The JSON field names are exactly the reflect-cpp serialization of the
    C++ structs (camera.parameters.hpp:6-17) -- a reference user's config file
    loads unchanged."""
    raw = json.loads(CONFIG.read_text())
    assert set(raw["camera"].keys()) == {
        "aspect_ratio", "image_width", "samples_per_pixel", "max_depth",
        "vertical_fov", "defocus_angle", "focus_distance",
        "lookfrom", "lookat", "world_up",
    }
    for sphere, mat in raw["objects"]:
        assert {"center", "radius"} <= set(sphere.keys())
        assert "material_def" in mat


def test_make_world_stress():
    import raytracing_tpu as rt

    cam, scene = rt.make_world_stress(500, seed=3)
    assert scene.num_objects == 500
    import numpy as np

    kinds = np.asarray(scene.mat_kind)
    assert (kinds == 0).sum() > (kinds == 1).sum() > (kinds == 2).sum() > 0
    # Reproducible for a fixed seed.
    _, scene2 = rt.make_world_stress(500, seed=3)
    np.testing.assert_array_equal(
        np.asarray(scene.centers), np.asarray(scene2.centers)
    )


def test_texture_material_defs_json_roundtrip(tmp_path):
    """CheckerMatDef / ImageMatDef (schema EXTENSIONS beyond the reference)
    parse from JSON, resolve relative texture paths against the config dir,
    and build textured scenes."""
    import json

    import numpy as np

    from raytracing_tpu.scene import config as rconfig
    from raytracing_tpu.scene.types import TextureKind
    from raytracing_tpu.utils import png

    tex = (np.arange(8 * 8 * 3).reshape(8, 8, 3) % 256).astype(np.uint8)
    png.write_png(str(tmp_path / "tex.png"), tex)
    cfg = {
        "camera": {"image_width": 64, "samples_per_pixel": 2, "max_depth": 2},
        "a_min": 0, "a_max": 0, "b_min": 0, "b_max": 0,
        "objects": [
            [
                {"center": [0, -1000, 0], "radius": 1000},
                {"material_def": "CheckerMatDef", "scale": 0.5,
                 "even_albedo": [0.2, 0.3, 0.1], "odd_albedo": [0.9, 0.9, 0.9]},
            ],
            [
                {"center": [0, 1, 0], "radius": 1},
                {"material_def": "ImageMatDef", "file": "tex.png"},
            ],
        ],
    }
    path = tmp_path / "world.json"
    path.write_text(json.dumps(cfg))
    world = rconfig.load_world(path)
    assert isinstance(world.objects[0][1], rconfig.CheckerMatDef)
    assert isinstance(world.objects[1][1], rconfig.ImageMatDef)

    _, scene = rconfig.build_world(world)
    assert scene.has_textures
    kinds = np.asarray(scene.tex_kind)
    assert (kinds == TextureKind.CHECKER).sum() == 1
    assert (kinds == TextureKind.IMAGE).sum() == 1
    assert scene.textures.shape == (1, 8, 8, 3)
    # JSON round-trip of the defs themselves.
    for _, mat in world.objects:
        rt = rconfig._parse_material_def(rconfig.material_def_to_json(mat))
        assert type(rt) is type(mat)


def test_make_world_textured_builds():
    import raytracing_tpu as rt

    cam, scene = rt.make_world_textured(image_width=96)
    assert scene.has_textures
    assert scene.num_objects == 5
    assert cam.defocus_angle > 0  # BASELINE config 3: defocus camera

"""Camera derivation vs hand-computed closed forms (reference math:
ray.tracer.core.cc:158-234)."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from raytracing_tpu.core import camera as rcamera
from raytracing_tpu.core import rng as rrng


def _simple_params(**kw):
    defaults = dict(
        aspect_ratio=2.0,
        image_width=200,
        samples_per_pixel=1,
        max_depth=1,
        vertical_fov=90.0,
        defocus_angle=0.0,
        focus_distance=1.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        world_up=(0.0, 1.0, 0.0),
    )
    defaults.update(kw)
    return rcamera.CameraParameters(**defaults)


def test_image_height_truncation():
    # height = uint32(float(width)/aspect) -- core.cc:174-175.
    assert rcamera.CameraParameters(aspect_ratio=1.7, image_width=1200).image_height == 705
    assert rcamera.CameraParameters(aspect_ratio=16 / 9, image_width=400).image_height == 225


def test_derive_axis_aligned_90deg():
    """vfov=90, focus=1, looking down -z: viewport is exactly 2 high, 4 wide
    (aspect 2 via W/H with integer height 100)."""
    cam = rcamera.derive(_simple_params())
    assert cam.image_height == 100
    # u = +x, v = +y, w = +z; viewport_u = 4x, viewport_v = -2y.
    np.testing.assert_allclose(np.asarray(cam.pixel_delta_u), [4.0 / 200, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.pixel_delta_v), [0, -2.0 / 100, 0], atol=1e-6)
    # upper-left = center - w - u*2 - (-v*1) = (-2, 1, -1); pixel00 shifts half a delta.
    np.testing.assert_allclose(
        np.asarray(cam.pixel00), [-2 + 0.01, 1 - 0.01, -1.0], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(cam.center), [0, 0, 0], atol=0)
    # No defocus: disk basis is zero-radius.
    np.testing.assert_allclose(np.asarray(cam.defocus_disk_u), 0.0, atol=1e-7)


def test_derive_cover_camera_viewport():
    """The shipped cover camera (world.config.json): vfov=20, focus=10 =>
    viewport height = 2*tan(10deg)*10."""
    p = _simple_params(
        aspect_ratio=1.7,
        image_width=1200,
        vertical_fov=20.0,
        defocus_angle=0.6,
        focus_distance=10.0,
        lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
    )
    cam = rcamera.derive(p)
    vp_h = 2.0 * np.tan(np.radians(10.0)) * 10.0
    vp_w = vp_h * (1200.0 / 705.0)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cam.pixel_delta_v)) * 705, vp_h, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cam.pixel_delta_u)) * 1200, vp_w, rtol=1e-5
    )
    # Defocus disk radius = focus * tan(angle/2) -- core.cc:195.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cam.defocus_disk_u)),
        10.0 * np.tan(np.radians(0.3)),
        rtol=1e-5,
    )
    # u, v, w orthonormal.
    u = np.asarray(cam.defocus_disk_u)
    v = np.asarray(cam.defocus_disk_v)
    assert abs(np.dot(u, v)) < 1e-6


def test_generate_rays_pinhole_origin_and_direction():
    cam = rcamera.derive(_simple_params())
    keys = rrng.ray_keys(jr.key(0), jnp.arange(4, dtype=jnp.int32))
    px = jnp.array([0, 199, 0, 100], jnp.int32)
    py = jnp.array([0, 0, 99, 50], jnp.int32)
    o, d = rcamera.generate_rays(cam, keys, px, py)
    o, d = np.asarray(o), np.asarray(d)
    # Pinhole (defocus 0): all origins at camera center.
    np.testing.assert_allclose(o, 0.0, atol=0)
    # Direction lands within the pixel footprint around its center.
    centers = (
        np.asarray(cam.pixel00)
        + px[:, None] * np.asarray(cam.pixel_delta_u)
        + py[:, None] * np.asarray(cam.pixel_delta_v)
    )
    err = d - centers
    assert (np.abs(err[:, 0]) <= 0.5 * 4.0 / 200 + 1e-6).all()
    assert (np.abs(err[:, 1]) <= 0.5 * 2.0 / 100 + 1e-6).all()
    np.testing.assert_allclose(err[:, 2], 0.0, atol=1e-6)


def test_generate_rays_defocus_origins_on_lens_disk():
    cam = rcamera.derive(_simple_params(defocus_angle=2.0, focus_distance=3.4))
    n = 512
    keys = rrng.ray_keys(jr.key(3), jnp.arange(n, dtype=jnp.int32))
    px = jnp.zeros((n,), jnp.int32)
    py = jnp.zeros((n,), jnp.int32)
    o, _ = rcamera.generate_rays(cam, keys, px, py)
    o = np.asarray(o)
    radius = 3.4 * np.tan(np.radians(1.0))
    dist = np.linalg.norm(o - np.asarray(cam.center), axis=-1)
    assert (dist <= radius + 1e-5).all()
    assert dist.std() > 0  # actually spread over the disk

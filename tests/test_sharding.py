"""Multi-device sharding on the forced 8-device CPU platform (conftest.py).

The key property: because sampling is keyed by global ray id, the sharded
render draws EXACTLY the same sample set as the single-device render for every
mesh shape -- the TPU-world statement of the reference's "tile order doesn't
matter" (shuffled queue, main.cc:631-633). Radiance agrees to float ULP noise
(each mesh shape compiles a different XLA program, so fma/fusion order
differs); the quantized u8 image is allowed one code of difference."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from raytracing_tpu import CameraParameters, Renderer
from raytracing_tpu.core import camera as rcamera
from raytracing_tpu.models import integrator
from raytracing_tpu.parallel import mesh as rmesh
from raytracing_tpu.parallel import shard as rshard
from raytracing_tpu.scene.types import SceneBuilder


def _scene():
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5))
    b.add_metallic_sphere((0.0, 0.0, -1.0), 0.5, (0.8, 0.6, 0.2), 0.1)
    b.add_dielectric_sphere((-1.1, 0.0, -1.0), 0.5, 1.5)
    return b.build()


def _params(**kw):
    d = dict(
        aspect_ratio=2.0,
        image_width=64,
        samples_per_pixel=8,
        max_depth=6,
        vertical_fov=60.0,
        defocus_angle=0.0,
        focus_distance=1.0,
        lookfrom=(0.0, 0.0, 0.5),
        lookat=(0.0, 0.0, -1.0),
    )
    d.update(kw)
    return CameraParameters(**d)


def test_eight_devices_available():
    assert jax.device_count() == 8


@pytest.mark.parametrize("sample_axis", [1, 2, 4, 8])
def test_mesh_shapes(sample_axis):
    m = rmesh.make_mesh(sample_axis=sample_axis)
    assert m.shape["px"] * m.shape["spp"] == 8
    assert m.shape["spp"] == sample_axis


def test_mesh_bad_factor_raises():
    with pytest.raises(ValueError):
        rmesh.make_mesh(sample_axis=3)


@pytest.mark.parametrize("sample_axis", [1, 2, 8])
def test_sharded_equals_single_device(sample_axis):
    """render_pixels_sharded == render_pixels (to ULP noise) for any split."""
    scene = _scene()
    cam = rcamera.derive(_params())
    key = jr.key(11)
    n_pix = 64 * 32
    # Pixel count divisible by px axis (64*32 = 2048, divisible by 8).
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    spp, chunk, depth = 8, 8, 5

    ref, ref_seg = integrator.render_pixels(
        scene, cam, key, pixel_ids, jnp.int32(0), chunk, spp, depth
    )

    m = rmesh.make_mesh(sample_axis=sample_axis)
    got, seg = rshard.render_pixels_sharded(
        scene, cam, key, pixel_ids, jnp.int32(0), chunk, spp, depth, m
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
    # Segment counts agree when the sample chunk divides evenly (no masked
    # tail rays traced for padding).
    if chunk % sample_axis == 0:
        assert int(seg) == int(ref_seg)


@pytest.mark.slow
def test_sharded_uneven_sample_chunk_masked_tail():
    """chunk=5 over spp axis of 4: devices trace ceil(5/4)=2 samples each,
    the 3 padding samples are masked -- radiance must still match exactly."""
    scene = _scene()
    cam = rcamera.derive(_params())
    key = jr.key(3)
    pixel_ids = jnp.arange(2048, dtype=jnp.int32)
    ref, _ = integrator.render_pixels(
        scene, cam, key, pixel_ids, jnp.int32(0), 5, 16, 4
    )
    m = rmesh.make_mesh(sample_axis=4)
    got, _ = rshard.render_pixels_sharded(
        scene, cam, key, pixel_ids, jnp.int32(0), 5, 16, 4, m
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
@pytest.mark.parametrize("sample_axis", [1, 2])
def test_full_renderer_with_mesh_bitwise(sample_axis):
    """End-to-end Renderer on a mesh == Renderer on one device, within one
    u8 quantization code (ULP-level float noise can flip a boundary pixel)."""
    scene = _scene()
    params = _params(samples_per_pixel=4, image_width=48)
    img_single = Renderer(scene, params, seed=5).render()
    m = rmesh.make_mesh(sample_axis=sample_axis)
    img_mesh = Renderer(scene, params, seed=5, mesh=m).render()
    diff = np.abs(img_single.astype(int) - img_mesh.astype(int))
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"
    assert (diff > 0).mean() < 0.01


@pytest.mark.slow
def test_renderer_mesh_with_pixel_padding():
    """Image with pixel count NOT divisible by the px axis (49 wide)."""
    scene = _scene()
    params = _params(samples_per_pixel=2, image_width=49, aspect_ratio=49 / 31)
    m = rmesh.make_mesh(sample_axis=2)  # px axis = 4; 49*31 = 1519 not /4
    img_single = Renderer(scene, params, seed=2).render()
    img_mesh = Renderer(scene, params, seed=2, mesh=m).render()
    diff = np.abs(img_single.astype(int) - img_mesh.astype(int))
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"


# ---------------------------------------------------------------------------
# Sharded pallas (regen megakernel under shard_map, interpret mode on CPU)
# ---------------------------------------------------------------------------


def _all_metal_scene():
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0)
    b.add_metallic_sphere((0.0, 0.0, -1.0), 0.5, (0.8, 0.6, 0.2), 0.0)
    return b.build()


@pytest.mark.slow
@pytest.mark.parametrize("sample_axis", [1, 2])
def test_pallas_sharded_matches_unsharded(sample_axis):
    """Fused-kernel shard_map path == single-kernel path (both in
    TPU-interpret mode on the CPU mesh). The kernel RNG is keyed by
    (slot, absolute sample), so EVERY mesh decomposition -- px split AND
    spp split -- traces the identical sample set: segment counts match
    exactly and radiance to f32 summation-order roundoff."""
    from raytracing_tpu.ops.pallas import trace as ptrace
    from raytracing_tpu.runtime import tiling as rtiling

    scene = _all_metal_scene()
    params = _params(image_width=64, samples_per_pixel=2, max_depth=4)
    cam = rcamera.derive(params)
    slots = rtiling.num_slots(cam.image_width, cam.image_height)
    # 64x32 -> 2048 slots = 2 kernel tiles; pad to 8 devices' px quantum.
    mesh = rmesh.make_mesh(jax.devices(), sample_axis=sample_axis)
    n_px = mesh.shape["px"]
    quantum = 1024 * n_px
    slots_padded = -(-slots // quantum) * quantum

    rad_1, seg_1 = ptrace._render_pixels_fused(
        scene,
        cam.pixel00, cam.pixel_delta_u, cam.pixel_delta_v, cam.center,
        cam.defocus_disk_u, cam.defocus_disk_v, cam.defocus_angle,
        jnp.int32(rtiling.tiles_per_row(cam.image_width)),
        jnp.int32(0), jnp.int32(3), jnp.int32(0),
        slots_padded, jnp.int32(2), jnp.int32(4),
        pixel_order="tiled", interpret=True,
    )
    rad_n, seg_n = rshard.render_pixels_fused_sharded(
        scene, cam,
        jnp.int32(0), jnp.int32(3), jnp.int32(0),
        jnp.int32(2), jnp.int32(4),
        slots_padded, mesh, pixel_order="tiled", interpret=True,
    )
    assert int(seg_1) == int(seg_n)
    np.testing.assert_allclose(
        np.asarray(rad_n), np.asarray(rad_1), atol=2e-4, rtol=1e-3
    )


@pytest.mark.slow
@pytest.mark.parametrize("sample_axis", [2, 4])
def test_pallas_sharded_work_ahead_waves_exact(sample_axis):
    """Sharded work-ahead regen: each spp shard owns a contiguous slice of
    the FULL budget and carries its own done counts across waves. Any wave
    decomposition must trace the identical sample set -- segment totals
    integer-EQUAL vs (a) the unsharded single kernel and (b) the sharded
    self-contained-wave path -- with radiance equal to f32 summation-order
    roundoff."""
    from raytracing_tpu.ops.pallas import trace as ptrace
    from raytracing_tpu.runtime import tiling as rtiling

    scene = _all_metal_scene()
    params = _params(image_width=64, samples_per_pixel=4, max_depth=4)
    cam = rcamera.derive(params)
    slots = rtiling.num_slots(cam.image_width, cam.image_height)
    mesh = rmesh.make_mesh(jax.devices(), sample_axis=sample_axis)
    n_px, n_sp = mesh.shape["px"], mesh.shape["spp"]
    quantum = 1024 * n_px
    slots_padded = -(-slots // quantum) * quantum
    spp, depth = 4, 4

    rad_1, seg_1 = ptrace._render_pixels_fused(
        scene,
        cam.pixel00, cam.pixel_delta_u, cam.pixel_delta_v, cam.center,
        cam.defocus_disk_u, cam.defocus_disk_v, cam.defocus_angle,
        jnp.int32(rtiling.tiles_per_row(cam.image_width)),
        jnp.int32(0), jnp.int32(3), jnp.int32(0),
        slots_padded, jnp.int32(spp), jnp.int32(depth),
        pixel_order="tiled", interpret=True,
    )
    rad_n, seg_n = rshard.render_pixels_fused_sharded(
        scene, cam,
        jnp.int32(0), jnp.int32(3), jnp.int32(0),
        jnp.int32(spp), jnp.int32(depth),
        slots_padded, mesh, pixel_order="tiled", interpret=True,
    )

    done = jnp.zeros((n_sp * slots_padded // 128, 128), jnp.int32)
    acc = jnp.zeros((slots_padded, 3), jnp.float32)
    segs = 0
    for t in (1, 3, spp):  # uneven wave targets on purpose
        rad, seg, done = rshard.render_pixels_fused_sharded(
            scene, cam,
            jnp.int32(0), jnp.int32(3), jnp.int32(0),
            jnp.int32(spp), jnp.int32(depth),
            slots_padded, mesh, pixel_order="tiled", interpret=True,
            done=done, t_end=jnp.int32(t),
        )
        acc = acc + rad
        segs += int(seg)
    d = np.asarray(done).reshape(n_sp, -1, 128)
    for s in range(n_sp):  # every shard drained to its own budget share
        lo, hi = (spp * s) // n_sp, (spp * (s + 1)) // n_sp
        assert (d[s] == hi - lo).all()
    assert int(seg_1) == int(seg_n) == segs
    np.testing.assert_allclose(
        np.asarray(acc), np.asarray(rad_1), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(acc), np.asarray(rad_n), atol=2e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_renderer_mesh_work_ahead_matches_unsharded():
    """End-to-end Renderer on a (px, spp) mesh with multi-wave work-ahead
    regen: identical sample set as the unsharded renderer (integer-equal
    segments), image within one u8 code (psum/wave regrouping is
    last-ulp), and the feature actually engages (some lane traces past a
    wave's cumulative target)."""
    scene = _all_metal_scene()
    # 64x64 -> 4096 slots == the px-axis quantum exactly: no padding slots,
    # so segment totals are comparable against the UNSHARDED renderer
    # (padded spill slots trace real segments and would differ).
    p = _params(aspect_ratio=1.0, image_width=64, samples_per_pixel=8,
                max_depth=4)
    mesh = rmesh.make_mesh(jax.devices(), sample_axis=2)
    # max_rays_per_batch=128 with an observer plans chunk_spp=2 -> four
    # deterministic waves (spp=8 skips the adaptive probe).
    r = Renderer(
        scene, p, seed=5, backend="pallas", mesh=mesh, max_rays_per_batch=128
    )
    engaged = []

    def spy(prog):
        if prog.samples_done < prog.samples_total:
            tot = np.asarray(r._per_slot_done(r._done)).ravel()
            engaged.append((tot > prog.samples_done).any())
            # No slot may fall below the cumulative target.
            assert tot.min() >= prog.samples_done

    img_mesh = r.render(on_progress=spy)
    assert engaged and any(engaged)
    assert np.asarray(r._per_slot_done(r._done)).min() == 8

    r1 = Renderer(scene, p, seed=5, backend="pallas")
    img_1 = r1.render()
    assert r.segments_traced == r1.segments_traced
    assert int(np.abs(img_mesh.astype(int) - img_1.astype(int)).max()) <= 1

    # And vs the sharded self-contained-wave path (RT_WORK_AHEAD=0).
    import os

    os.environ["RT_WORK_AHEAD"] = "0"
    try:
        r0 = Renderer(
            scene, p, seed=5, backend="pallas", mesh=mesh,
            max_rays_per_batch=128,
        )
        img_0 = r0.render()
    finally:
        del os.environ["RT_WORK_AHEAD"]
    assert r0.segments_traced == r.segments_traced
    assert int(np.abs(img_mesh.astype(int) - img_0.astype(int)).max()) <= 1


@pytest.mark.slow
def test_renderer_mesh_work_ahead_checkpoint_resume(tmp_path):
    """A sharded work-ahead checkpoint carries the per-shard done blocks
    (+ the budget that laid them out); resuming reproduces the
    uninterrupted render exactly."""
    scene = _all_metal_scene()
    p = _params(image_width=64, samples_per_pixel=8, max_depth=4)
    mesh = rmesh.make_mesh(jax.devices(), sample_axis=2)
    path = str(tmp_path / "ckpt.npz")
    r = Renderer(
        scene, p, seed=9, backend="pallas", mesh=mesh, max_rays_per_batch=128
    )
    saved = []

    def save_once(prog):
        if not saved and prog.samples_done < prog.samples_total:
            r.save_checkpoint(path)
            saved.append(prog.samples_done)

    img_full = r.render(on_progress=save_once)
    assert saved and saved[0] < 8

    r2 = Renderer(
        scene, p, seed=9, backend="pallas", mesh=mesh, max_rays_per_batch=128
    )
    assert r2.load_checkpoint(path) == saved[0]
    assert r2._done is not None and r2._done_budget == 8
    img_resumed = r2.render(resume=True)
    np.testing.assert_array_equal(img_resumed, img_full)
    assert r2.segments_traced == r.segments_traced

    # A ragged mid-work-ahead sharded state cannot be re-split toward a
    # different budget -- must refuse rather than silently misdraw.
    r3 = Renderer(
        scene, p, seed=9, backend="pallas", mesh=mesh, max_rays_per_batch=128
    )
    r3.load_checkpoint(path)
    if not np.array_equal(
        np.asarray(r3._done),
        r3._prefix_done_np(np.asarray(r3._done).shape[0] // 2, saved[0], 8),
    ):
        with pytest.raises(ValueError, match="different spp"):
            r3.render(spp=16, resume=True)


@pytest.mark.slow
def test_renderer_mesh_work_ahead_resume_larger_budget_from_boundary():
    """A COMPLETED sharded work-ahead render is a sample-prefix in any
    split; resuming it toward a larger spp re-splits the done blocks and
    continues exactly (same sample set as one uninterrupted render)."""
    scene = _all_metal_scene()
    p = _params(image_width=64, samples_per_pixel=4, max_depth=4)
    mesh = rmesh.make_mesh(jax.devices(), sample_axis=2)
    r = Renderer(scene, p, seed=3, backend="pallas", mesh=mesh)
    r.render(spp=4)
    img_grown = r.render(spp=8, resume=True)
    r1 = Renderer(scene, p, seed=3, backend="pallas", mesh=mesh)
    img_once = r1.render(spp=8)
    assert r.segments_traced == r1.segments_traced
    assert int(np.abs(img_grown.astype(int) - img_once.astype(int)).max()) <= 1


def test_renderer_pallas_backend_with_mesh_runs():
    """End-to-end Renderer with backend='pallas' + mesh on the CPU platform
    (kernels in interpret mode)."""
    scene = _all_metal_scene()
    params = _params(image_width=64, samples_per_pixel=2, max_depth=4)
    mesh = rmesh.make_mesh(jax.devices(), sample_axis=2)
    r = Renderer(scene, params, seed=0, backend="pallas", mesh=mesh)
    img = r.render(spp=2)
    assert img.shape == (32, 64, 3)
    assert img.dtype == np.uint8
    assert r.segments_traced > 0
    # Deterministic scene: matches the unsharded pallas renderer exactly.
    r1 = Renderer(scene, params, seed=0, backend="pallas", mesh=None)
    img1 = r1.render(spp=2)
    np.testing.assert_array_equal(img, img1)

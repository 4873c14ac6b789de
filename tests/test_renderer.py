"""Renderer orchestration: chunk invariance, progress metrics, PNG output.

The chunk-invariance test is the TPU-world analog of the reference's
"tile order doesn't matter" property (shuffled tiles, main.cc:631-633): here
the image is bitwise identical for ANY work decomposition because the RNG is
keyed by global ray id."""

import numpy as np
import pytest

from raytracing_tpu import CameraParameters, Renderer, make_world_basic
from raytracing_tpu.scene.types import SceneBuilder
from raytracing_tpu.utils import png


def _small_scene():
    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5))
    b.add_metallic_sphere((0.0, 0.0, -1.0), 0.5, (0.8, 0.6, 0.2), 0.05)
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
        world_up=(0.0, 1.0, 0.0),
    )
    d.update(kw)
    return CameraParameters(**d)


def test_render_shape_dtype_and_content():
    r = Renderer(_small_scene(), _params(), seed=1)
    img = r.render()
    assert img.shape == (32, 64, 3)
    assert img.dtype == np.uint8
    # Sky at the top, ground at the bottom -> image is not constant.
    assert img.std() > 10
    # Top rows are sky-ish blue gradient: blue channel dominates red.
    assert img[0, :, 2].mean() > img[0, :, 0].mean()


def test_chunking_invariance_bitwise():
    """Same seed, wildly different work decomposition -> identical image."""
    scene = _small_scene()
    r_big = Renderer(scene, _params(), seed=7, max_rays_per_batch=1 << 20)
    r_tiny = Renderer(scene, _params(), seed=7, max_rays_per_batch=512)
    img_big = r_big.render()
    img_tiny = r_tiny.render()
    np.testing.assert_array_equal(img_big, img_tiny)


def test_frame_accum_matches_oneshot_render():
    """Converge-while-interactive contract: k accumulated frames at a held
    pose present the BYTE-identical image of a single render at the
    accumulated spp (same seed -> same absolute sample ids), for any frame
    chunking; frame_accum_reset() restarts the stream."""
    scene = _small_scene()
    p = _params(samples_per_pixel=4, max_depth=3)
    oracle = Renderer(scene, p, seed=3, backend="pallas")
    ref = oracle.render(spp=4)
    r = Renderer(scene, p, seed=3, backend="pallas")
    for chunks in [(4,), (1, 3), (2, 2), (1, 1, 1, 1)]:
        r.frame_accum_reset()
        for c in chunks:
            dev, total = r.render_frame_accum(spp=c)
        assert total == 4 == r.frame_accum_samples
        np.testing.assert_array_equal(r.fetch_image(dev), ref)


def test_frame_accum_rejects_mesh_and_resize():
    """The accum frame path is single-chip (bypasses the mesh) and its
    buffer is resolution-bound: both misuse modes must fail loudly."""
    import jax
    from raytracing_tpu.parallel import mesh as rmesh

    scene = _small_scene()
    r = Renderer(
        scene, _params(), seed=1, backend="pallas",
        mesh=rmesh.make_mesh(jax.devices()[:1]),
    )
    with pytest.raises(ValueError, match="single-chip"):
        r.render_frame_accum(spp=1)

    from raytracing_tpu.core import camera as rcamera

    r2 = Renderer(scene, _params(), seed=1, backend="pallas")
    r2.render_frame_accum(spp=1)
    # Mid-accumulation resolution change: the held sum buffer no longer
    # matches the slot count and must fail loudly, not silently mix.
    r2.params = _params(image_width=128)
    r2.camera = rcamera.derive(r2.params)
    with pytest.raises(ValueError, match="resolution"):
        r2.render_frame_accum(spp=1)
    r2.frame_accum_reset()  # documented recovery path
    dev, total = r2.render_frame_accum(spp=1)
    assert total == 1


def test_frame_accum_preview_is_fullres_identity_at_small_frames():
    """At frames <= the preview size the box factors are 1, so the
    device-side preview must be the exact full-resolution image."""
    scene = _small_scene()
    p = _params(samples_per_pixel=2, max_depth=3)
    r = Renderer(scene, p, seed=5, backend="pallas")
    dev, prev, total = r.render_frame_accum_preview(spp=2)
    assert total == 2
    np.testing.assert_array_equal(np.asarray(prev), r.fetch_image(dev))


def test_seed_changes_noise():
    scene = _small_scene()
    img1 = Renderer(scene, _params(), seed=1).render()
    img2 = Renderer(scene, _params(), seed=2).render()
    assert not np.array_equal(img1, img2)


def test_progress_callback_and_metrics():
    scene = _small_scene()
    r = Renderer(scene, _params(samples_per_pixel=16), seed=0, max_rays_per_batch=4096)
    events = []

    def on_progress(p):
        events.append((p.samples_done, p.fraction, p.pixels_raytraced))
        assert p.pixels_count == 64 * 32
        assert 0 < p.samples_done <= p.samples_total
        preview = p.preview()
        assert preview.shape == (32, 64, 3)
        assert preview.dtype == np.uint8

    img = r.render(on_progress=on_progress)
    assert len(events) >= 2
    done = [e[0] for e in events]
    assert done == sorted(done)
    assert events[-1][0] == 16
    assert events[-1][1] == 1.0
    assert r.pixels_raytraced == r.pixels_count
    assert r.segments_traced > 0
    assert r.render_time() > 0
    assert r.mrays_per_sec() > 0
    assert img.shape == (32, 64, 3)


def test_final_preview_matches_render():
    scene = _small_scene()
    r = Renderer(scene, _params(), seed=3, max_rays_per_batch=2048)
    previews = []
    img = r.render(on_progress=lambda p: previews.append(p.preview()))
    np.testing.assert_array_equal(previews[-1], img)


def test_render_max_depth_zero_black():
    r = Renderer(_small_scene(), _params(), seed=0)
    img = r.render(max_depth=0)
    np.testing.assert_array_equal(img, 0)


def test_png_roundtrip(tmp_path):
    cam, scene = make_world_basic()
    r = Renderer(scene, _params(image_width=32, samples_per_pixel=2), seed=0)
    img = r.render()
    path = tmp_path / "out.png"
    png.write_png(path, img)
    back = png.read_png(path)
    np.testing.assert_array_equal(back, img)


def test_reseed_fresh_stream_keeps_wave_rate():
    """reseed() must (a) produce the same image as a fresh Renderer with
    that seed (stream identity -- bench.py's best-of-N relies on it to
    defeat the tunnel's identical-execution dedupe), (b) drop accumulated
    state so the next render starts clean, and (c) KEEP the measured wave
    rate so repeat renders skip the 8-spp probe wave."""
    cam_params = _params(image_width=32, samples_per_pixel=4)
    scene = _small_scene()
    r = Renderer(scene, cam_params, seed=0)
    img0 = r.render()
    r._wave_rate = 123.0  # pretend a previous adaptive render measured it
    r.reseed(7)
    assert r._wave_rate == 123.0
    assert r._image_sum is None and r.segments_traced == 0
    img7 = r.render()
    fresh7 = Renderer(scene, cam_params, seed=7).render()
    np.testing.assert_array_equal(img7, fresh7)
    assert (img7 != img0).any()


@pytest.mark.slow
def test_work_ahead_multi_wave_matches_single_wave():
    """Work-ahead regen: lanes that reach a wave's target keep tracing
    their own slot's samples toward the full budget instead of idling on
    the tile's stragglers. Any wave decomposition must (a) trace the
    identical sample set (absolute (slot, sample, bounce) RNG keys),
    (b) report the EXACT same segment total (open paths at a wave
    boundary are re-traced next wave; the kernel subtracts their partial
    depth so nothing is double counted), and (c) reproduce the image to
    f32 summation-order roundoff."""
    scene = _small_scene()
    p = _params(
        aspect_ratio=1.0, image_width=32, samples_per_pixel=32, max_depth=6
    )
    # 32x32 image -> 1024 slots; max_rays_per_batch=256 with an observer
    # plans chunk_spp=16: exactly two deterministic waves (spp=32 skips
    # the adaptive probe).
    r2w = Renderer(
        scene, p, seed=5, backend="pallas", max_rays_per_batch=256
    )
    worked_ahead = []

    def spy(prog):
        if prog.samples_done < prog.samples_total:
            done = np.asarray(r2w._done)
            worked_ahead.append((done > prog.samples_done).any())
            assert (done >= prog.samples_done).all()

    img_2w = r2w.render(on_progress=spy)
    # The feature must actually engage: some lane finished wave 1's
    # 16-sample target early and traced ahead.
    assert worked_ahead and any(worked_ahead)
    assert np.asarray(r2w._done).min() == 32  # final wave drains to spp

    r1w = Renderer(scene, p, seed=5, backend="pallas")
    img_1w = r1w.render()
    assert r2w.segments_traced == r1w.segments_traced
    np.testing.assert_allclose(
        np.asarray(r2w._image_sum),
        np.asarray(r1w._image_sum),
        rtol=1e-5,
        atol=2e-5,
    )
    # u8 quantization absorbs the last-ulp regrouping differences.
    assert int(np.abs(img_2w.astype(int) - img_1w.astype(int)).max()) <= 1


def test_work_ahead_checkpoint_resume_exact(tmp_path):
    """A checkpoint taken at a work-ahead wave boundary carries the
    per-slot done counts; resuming must not re-trace (= double count)
    samples whose sums are already in image_sum."""
    scene = _small_scene()
    p = _params(
        aspect_ratio=1.0, image_width=32, samples_per_pixel=32, max_depth=6
    )
    path = str(tmp_path / "ckpt.npz")
    r = Renderer(scene, p, seed=9, backend="pallas", max_rays_per_batch=256)
    saved = []

    def save_once(prog):
        if not saved and prog.samples_done < prog.samples_total:
            r.save_checkpoint(path)
            saved.append(prog.samples_done)

    img_full = r.render(on_progress=save_once)
    assert saved and saved[0] < 32

    r2 = Renderer(scene, p, seed=9, backend="pallas", max_rays_per_batch=256)
    assert r2.load_checkpoint(path) == saved[0]
    assert r2._done is not None
    img_resumed = r2.render(resume=True)
    np.testing.assert_array_equal(img_resumed, img_full)
    np.testing.assert_allclose(
        np.asarray(r2._image_sum),
        np.asarray(r._image_sum),
        rtol=1e-6,
        atol=1e-6,
    )
    assert np.asarray(r2._done).min() == 32


def test_known_rate_sizes_first_wave_from_evidence():
    """With a stored wave rate, the first adaptive wave is ~rate * 15 s
    instead of the 8-spp probe: repeat renders (bench.py) avoid paying the
    straggler-tail-expensive small wave again. Verified through _plan +
    the wave-init logic by inspecting samples_done progression via the
    progress callback (observer present -> capped by the planner chunk,
    the documented granularity contract)."""
    p = _params(image_width=32, samples_per_pixel=40)
    r = Renderer(_small_scene(), p, seed=0)
    if r.backend != "pallas":
        return
    waves = []
    r.render(spp=40, on_progress=lambda p_: waves.append(p_.samples_done))
    # Fresh instance, no rate: first wave is the 8-spp probe.
    assert waves and waves[0] <= 8
    r2 = Renderer(_small_scene(), p, seed=0)
    r2._wave_rate = 1e9  # "instant" rate -> first wave jumps to the cap
    waves2 = []
    r2.render(spp=40, on_progress=lambda p_: waves2.append(p_.samples_done))
    assert waves2[0] > 8
    """Straggler amortization: a sample budget is never split into more
    than ~4 waves (a kernel wave ends when ALL lanes finish their chunk,
    so many small chunks pay the long-path tail repeatedly -- measured
    41 -> 77 Mrays/s on the cover scene at depth 50, chunk 32 -> 128)."""
    r = Renderer(_small_scene(), _params(), seed=0, backend="pallas")
    slots_1080p = 2_073_600
    _, chunk = r._plan(1000, slots_1080p)
    assert chunk >= 250
    # Small budgets are not split at all.
    _, chunk = r._plan(4, slots_1080p)
    assert chunk == 4

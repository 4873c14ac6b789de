"""Runtime shell: CLI, logging, live display, checkpoint/resume, native lib.

These exercise the application-layer capabilities mapped from the reference's
L4-L6 (SURVEY.md sections 2G/2I, 5.3-5.6): progressive display with progress
bars + elapsed time, structured logging, clean interruption via
checkpoint/resume, PNG persistence.
"""

import io
import os

import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.runtime import display as rdisplay
from raytracing_tpu.runtime.renderer import RenderProgress
from raytracing_tpu.utils import logging as rlogging
from raytracing_tpu.utils import native as rnative
from raytracing_tpu.utils import png as rpng


def _tiny_params(width=48, spp=2, depth=3):
    return rt.CameraParameters(
        aspect_ratio=1.5,
        image_width=width,
        samples_per_pixel=spp,
        max_depth=depth,
        vertical_fov=30.0,
        defocus_angle=0.0,
        focus_distance=10.0,
        lookfrom=(0.0, 1.0, 3.0),
        lookat=(0.0, 0.5, 0.0),
    )


def _tiny_scene():
    from raytracing_tpu.scene.types import SceneBuilder

    b = SceneBuilder()
    b.add_lambertian_sphere((0.0, -100.5, 0.0), 100.0, (0.5, 0.5, 0.5))
    b.add_lambertian_sphere((0.0, 0.5, 0.0), 0.5, (0.7, 0.3, 0.3))
    return b.build()


# ---------------------------------------------------------------------------
# checkpoint / resume
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    scene = _tiny_scene()
    params = _tiny_params(spp=4)

    one_shot = rt.Renderer(scene, params, seed=7, backend="xla")
    img_full = one_shot.render(spp=4)

    first = rt.Renderer(scene, params, seed=7, backend="xla")
    first.render(spp=2)
    ck = str(tmp_path / "ck.npz")
    first.save_checkpoint(ck)

    second = rt.Renderer(scene, params, seed=7, backend="xla")
    assert second.load_checkpoint(ck) == 2
    img_resumed = second.render(spp=4, resume=True)

    np.testing.assert_array_equal(img_resumed, img_full)
    assert second.samples_done == 4


def test_checkpoint_fingerprint_mismatch(tmp_path):
    scene = _tiny_scene()
    params = _tiny_params()
    r = rt.Renderer(scene, params, seed=1, backend="xla")
    r.render(spp=1)
    ck = str(tmp_path / "ck.npz")
    r.save_checkpoint(ck)

    other = rt.Renderer(scene, params, seed=2, backend="xla")  # wrong seed
    with pytest.raises(ValueError, match="fingerprint"):
        other.load_checkpoint(ck)


def test_checkpoint_before_render_raises(tmp_path):
    r = rt.Renderer(_tiny_scene(), _tiny_params(), backend="xla")
    with pytest.raises(ValueError):
        r.save_checkpoint(str(tmp_path / "x.npz"))


# ---------------------------------------------------------------------------
# displays
# ---------------------------------------------------------------------------


def _fake_progress(img):
    return RenderProgress(
        samples_done=3,
        samples_total=4,
        pixels_count=img.shape[0] * img.shape[1],
        segments_traced=1234,
        elapsed_s=0.5,
        _preview=lambda: img,
    )


def test_terminal_display_writes_frame_and_bars():
    img = np.full((8, 12, 3), 128, np.uint8)
    out = io.StringIO()
    disp = rdisplay.TerminalDisplay(stream=out, max_width=12, max_height=8)
    disp(_fake_progress(img))
    text = out.getvalue()
    assert "▀" in text                    # half-block glyphs
    assert "38;2;128;128;128" in text          # 24-bit color
    assert "Pixels" in text and "Samples" in text and "Elapsed" in text
    assert "(3/4 spp)" in text
    # Second frame rewinds the cursor instead of appending.
    disp(_fake_progress(img))
    assert "\x1b[" in out.getvalue()


def test_terminal_display_downsamples_to_fit():
    img = np.zeros((64, 64, 3), np.uint8)
    small = rdisplay._downsample(img, 16, 16)
    assert small.shape[0] <= 16 and small.shape[1] <= 16


def test_file_sequence_display(tmp_path):
    img = np.zeros((6, 6, 3), np.uint8)
    disp = rdisplay.FileSequenceDisplay(str(tmp_path), every=2)
    for _ in range(4):
        disp(_fake_progress(img))
    files = sorted(p.name for p in tmp_path.iterdir())
    assert files == ["preview_0001.png", "preview_0003.png"]
    assert rpng.read_png(tmp_path / "preview_0001.png").shape == (6, 6, 3)


def test_compose_halfblock_python_fallback():
    img = np.zeros((4, 3, 3), np.uint8)
    img[0, :, 0] = 255  # top row red
    frame = rdisplay.compose_halfblock_frame(img)
    assert frame.count("▀") == 6  # 3 cols x 2 text rows
    assert "38;2;255;0;0" in frame


# ---------------------------------------------------------------------------
# structured logging
# ---------------------------------------------------------------------------


def test_logging_setup_writes_timestamped_file(tmp_path):
    path = rlogging.setup(str(tmp_path), console=False)
    try:
        log = rlogging.get_logger("test")
        log.info("hello %d", 42)
        log.debug("dbg")
    finally:
        rlogging.teardown()
    assert path is not None and os.path.basename(path).startswith("raytracer_")
    content = open(path).read()
    assert "INFO: hello 42" in content
    assert "DEBUG: dbg" in content
    # quill-style pattern: [time] [thread] [file:line] LEVEL: msg
    assert "[t:" in content and "test_runtime_shell.py:" in content


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def test_cli_end_to_end(tmp_path):
    from raytracing_tpu import cli

    out = str(tmp_path / "o.png")
    ck = str(tmp_path / "ck.npz")
    rc = cli.main([
        "--width", "48", "--spp", "2", "--depth", "3",
        "--out", out, "--backend", "xla", "--quiet",
        "--log-dir", str(tmp_path), "--checkpoint", ck,
        "--preview-dir", str(tmp_path / "prev"),
    ])
    assert rc == 0
    img = rpng.read_png(out)
    assert img.shape[1] == 48
    assert os.path.exists(ck)
    assert any(p.name.endswith(".log") for p in tmp_path.iterdir())
    assert any((tmp_path / "prev").iterdir())

    # Resuming from the finished checkpoint with more spp continues it.
    rc = cli.main([
        "--width", "48", "--spp", "4", "--depth", "3",
        "--out", out, "--backend", "xla", "--quiet", "--checkpoint", ck,
    ])
    assert rc == 0
    data = np.load(ck)
    assert int(data["samples_done"]) == 4


def test_cli_parser_defaults():
    from raytracing_tpu import cli

    args = cli.build_arg_parser().parse_args([])
    assert args.config.endswith("world.config.json")
    assert args.backend == "auto"


# ---------------------------------------------------------------------------
# native helpers (skipped when the C++ lib is not built)
# ---------------------------------------------------------------------------

needs_native = pytest.mark.skipif(
    not rnative.available(), reason="native/librtnative.so not built"
)


@needs_native
def test_native_png_roundtrip(tmp_path):
    img = (np.random.default_rng(3).random((33, 47, 3)) * 255).astype(np.uint8)
    p = tmp_path / "n.png"
    rpng.write_png(p, img)  # routes through the native encoder for RGB
    np.testing.assert_array_equal(rpng.read_png(p), img)


@needs_native
def test_native_compose_matches_python_glyphs():
    img = (np.random.default_rng(4).random((10, 7, 3)) * 255).astype(np.uint8)
    frame = rnative.compose_halfblock(img)
    assert frame.count("▀") == 7 * 5


@needs_native
def test_native_frame_pump(tmp_path):
    img = np.full((8, 8, 3), 9, np.uint8)
    with rnative.FramePump(str(tmp_path / "f_"), queue_depth=2) as pump:
        pump.submit(img, 0)
        pump.submit(img, 1)
    files = sorted(p.name for p in tmp_path.iterdir())
    assert files == ["f_0000.png", "f_0001.png"]
    np.testing.assert_array_equal(rpng.read_png(tmp_path / "f_0000.png"), img)


# ---------------------------------------------------------------------------
# interactive single-dispatch frames
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_render_frame_matches_render():
    """The fused one-dispatch frame path produces the same image as a full
    render at equal spp (pallas backend, interpret mode on CPU; deterministic
    because interpret-mode PRNG draws are zeros)."""
    from raytracing_tpu.scene.types import SceneBuilder

    b = SceneBuilder()
    b.add_metallic_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0)
    b.add_metallic_sphere((0.0, 0.0, -1.0), 0.5, (0.8, 0.6, 0.2), 0.0)
    scene = b.build()
    params = _tiny_params(width=64, spp=2, depth=4)

    r = rt.Renderer(scene, params, seed=0, backend="pallas")
    full = r.render(spp=2)

    r2 = rt.Renderer(scene, params, seed=0, backend="pallas")
    dev = r2.render_frame(spp=2)
    frame = r2.fetch_image(dev)
    assert frame.shape == full.shape
    np.testing.assert_array_equal(frame, full)


def test_render_frame_requires_pallas():
    r = rt.Renderer(_tiny_scene(), _tiny_params(), backend="xla")
    with pytest.raises(ValueError, match="pallas"):
        r.render_frame(spp=1)


def test_render_frame_preview_covers_whole_frame():
    """The device-side preview must be a box downsample of the ENTIRE frame.

    Regression test for the floor-factor crop bug: with a frame that is not
    a multiple of the preview size (here 66x44 with a 32x16 preview grid),
    floor factors + crop silently dropped the right/bottom edge. The fix
    uses ceil box factors with edge padding, so the preview reproduces a
    host-computed downsample of the full fetched image exactly -- including
    the last row/column of boxes."""
    from raytracing_tpu.scene.types import SceneBuilder

    b = SceneBuilder()
    b.add_metallic_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0)
    b.add_metallic_sphere((0.0, 0.0, -1.0), 0.5, (0.8, 0.6, 0.2), 0.0)
    scene = b.build()
    params = rt.CameraParameters(
        aspect_ratio=1.5,
        image_width=66,  # 66x44: neither divisible by the preview grid
        samples_per_pixel=2,
        max_depth=4,
        vertical_fov=30.0,
        defocus_angle=0.0,
        focus_distance=10.0,
        lookfrom=(0.0, 1.0, 3.0),
        lookat=(0.0, 0.5, 0.0),
    )

    r = rt.Renderer(scene, params, seed=0, backend="pallas")
    dev, prev = r.render_frame_preview(spp=2, preview_rows=16, preview_cols=32)
    frame = r.fetch_image(dev)
    prev = np.asarray(prev)

    h, w = frame.shape[:2]
    fy = -(-h // 16)  # ceil factors as the renderer computes them
    fx = -(-w // 32)
    ph, pw = -(-h // fy), -(-w // fx)
    assert prev.shape == (ph, pw, 3)
    padded = np.pad(
        frame, ((0, ph * fy - h), (0, pw * fx - w), (0, 0)), mode="edge"
    ).astype(np.float32)
    expect = padded.reshape(ph, fy, pw, fx, 3).mean(axis=(1, 3))
    np.testing.assert_array_equal(prev, (expect + 0.5).astype(np.uint8))
    # The bottom-right preview cell must reflect bottom-right image content
    # (the old crop made it a function of interior pixels only).
    assert prev[-1, -1].tolist() == (
        (expect + 0.5).astype(np.uint8)[-1, -1].tolist()
    )


def test_checkpoint_mid_render_from_progress_callback(tmp_path):
    """save_checkpoint must work while a render is in flight (the Ctrl-C
    path persists the latest completed chunk; accumulate buffers must not be
    donated out from under self._image_sum)."""
    scene = _tiny_scene()
    params = _tiny_params(spp=4)
    r = rt.Renderer(scene, params, seed=3, backend="xla",
                    max_rays_per_batch=1 << 10)
    ck = str(tmp_path / "mid.npz")
    saved = []

    def on_progress(p):
        if p.samples_done < p.samples_total and not saved:
            r.save_checkpoint(ck)
            saved.append(p.samples_done)

    img_full = r.render(spp=4, on_progress=on_progress)
    assert saved and saved[0] < 4 and os.path.exists(ck)

    resumed = rt.Renderer(scene, params, seed=3, backend="xla",
                          max_rays_per_batch=1 << 10)
    assert resumed.load_checkpoint(ck) == saved[0]
    img_resumed = resumed.render(spp=4, resume=True)
    np.testing.assert_array_equal(img_resumed, img_full)


def test_checkpoint_mesh_shape_mismatch(tmp_path):
    """Resuming a pallas checkpoint under a different mesh quantum must fail
    with a clear error, not a deep shape mismatch."""
    import jax

    from raytracing_tpu.parallel import mesh as rmesh
    from raytracing_tpu.scene.types import SceneBuilder

    b = SceneBuilder()
    b.add_metallic_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0)
    scene = b.build()
    params = _tiny_params(width=64)
    mesh = rmesh.make_mesh(jax.devices(), sample_axis=1)  # px=8 -> 8192 rows
    r = rt.Renderer(scene, params, seed=0, backend="pallas", mesh=mesh)
    r.render(spp=1)
    ck = str(tmp_path / "mesh.npz")
    r.save_checkpoint(ck)

    single = rt.Renderer(scene, params, seed=0, backend="pallas", mesh=None)
    with pytest.raises(ValueError, match="mesh"):
        single.load_checkpoint(ck)


def test_render_frame_rejects_mesh():
    import jax

    from raytracing_tpu.parallel import mesh as rmesh

    mesh = rmesh.make_mesh(jax.devices(), sample_axis=1)
    r = rt.Renderer(_tiny_scene(), _tiny_params(), backend="pallas", mesh=mesh)
    with pytest.raises(ValueError, match="single-chip"):
        r.render_frame(spp=1)


def test_checkpoint_path_without_npz_extension(tmp_path):
    """np.savez appends .npz; save/load must normalize so resume finds it."""
    r = rt.Renderer(_tiny_scene(), _tiny_params(), seed=5, backend="xla")
    r.render(spp=1)
    raw = str(tmp_path / "run.ck")
    r.save_checkpoint(raw)
    assert os.path.exists(raw + ".npz")
    r2 = rt.Renderer(_tiny_scene(), _tiny_params(), seed=5, backend="xla")
    assert r2.load_checkpoint(raw) == 1  # loads via the same normalization


def test_terminal_display_rewind_matches_lines_emitted():
    """The ANSI rewind must equal the number of rows emitted per frame or
    the live view creeps up the terminal."""
    img = np.zeros((8, 10, 3), np.uint8)
    out = io.StringIO()
    disp = rdisplay.TerminalDisplay(stream=out, max_width=10, max_height=8)
    disp(_fake_progress(img))
    first = out.getvalue()
    rows_emitted = first.count("\n")
    disp(_fake_progress(img))
    second = out.getvalue()[len(first):]
    import re

    m = re.match(r"\x1b\[(\d+)F", second)
    assert m, "second frame must start with a cursor rewind"
    assert int(m.group(1)) == rows_emitted


def test_pallas_sample_limit_not_supported():
    from raytracing_tpu.core import camera as rcamera
    from raytracing_tpu.models import integrator

    import jax.numpy as jnp
    import jax.random as jr

    scene = _tiny_scene()
    cam = rcamera.derive(_tiny_params())
    with pytest.raises(NotImplementedError, match="sample_limit"):
        integrator.render_pixels(
            scene, cam, jr.key(0), jnp.arange(1024, dtype=jnp.int32),
            jnp.int32(0), 1, 1, 2, backend="pallas",
            sample_limit=jnp.int32(1),
        )


def test_cli_stress_scene(tmp_path):
    from raytracing_tpu import cli

    out = str(tmp_path / "s.png")
    rc = cli.main([
        "--stress", "32", "--width", "48", "--spp", "1", "--depth", "2",
        "--backend", "xla", "--out", out, "--quiet",
    ])
    assert rc == 0
    img = rpng.read_png(out)
    assert img.shape[1] == 48 and img.sum() > 0

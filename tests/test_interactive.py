"""Interactive session: key bindings, camera rig, event loop (the analog of
the reference's SDL event pump + ESC quit, platform.window.cc:110-140)."""

import io
import math
import os
import subprocess
import sys

import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.runtime.interactive import ESC, InteractiveSession
from raytracing_tpu.scene.types import SceneBuilder


def _session(backend="pallas", width=64):
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0)
    b.add_lambertian_sphere((0.0, 0.0, -1.0), 0.5, (0.7, 0.3, 0.3))
    scene = b.build()
    params = rt.CameraParameters(
        aspect_ratio=2.0, image_width=width, samples_per_pixel=2, max_depth=3,
        vertical_fov=45.0, defocus_angle=0.0, focus_distance=2.0,
        lookfrom=(0.0, 0.5, 1.5), lookat=(0.0, 0.0, -1.0),
    )
    return InteractiveSession(
        scene, params, seed=0, backend=backend, stream=io.StringIO()
    )


def test_key_bindings_move_the_camera():
    s = _session()
    az0, el0, d0 = s.orbit.azimuth, s.orbit.elevation, s.orbit.distance
    s.handle_key("a")
    assert s.orbit.azimuth < az0
    s.handle_key("d")
    s.handle_key("d")
    assert s.orbit.azimuth > az0
    s.handle_key("w")
    assert s.orbit.elevation > el0
    s.handle_key("+")
    assert s.orbit.distance < d0
    s.handle_key("-")
    s.handle_key("r")
    assert (s.orbit.azimuth, s.orbit.elevation, s.orbit.distance) == (
        az0, el0, d0,
    )
    s.handle_key("?")  # unbound: ignored, like unhandled SDL events
    assert not s.quit
    s.handle_key(ESC)
    assert s.quit


def test_elevation_clamped():
    s = _session()
    for _ in range(100):
        s.handle_key("w")
    assert s.orbit.elevation <= math.radians(85.0) + 1e-9
    # lookfrom stays finite and at the configured distance.
    lf = np.asarray(s.orbit.lookfrom())
    assert np.isfinite(lf).all()


def test_step_renders_and_camera_motion_changes_image():
    s = _session()
    img0 = s.step()
    img1 = s.step("dddddddddd")  # 60 degrees of orbit
    assert img0.shape == img1.shape == (32, 64, 3)
    assert s.frames_rendered == 2
    assert not np.array_equal(img0, img1)
    out = s.display.stream.getvalue()
    assert "Elapsed" in out and "keys:" in out


def test_idle_frames_converge_byte_equal_to_oneshot():
    """The reference's defining UX (main.cc:733-774): a paused camera
    visibly refines. Contract: after k idle frames the PRESENTED image is
    byte-equal to a one-shot render at the accumulated spp with the same
    seed/pose."""
    s = _session()  # spp=2 per frame; idle chunks grow 2, 4, 8, ...
    img = None
    for _ in range(3):
        img = s.step()
    assert s.samples_at_pose == 14  # 2 + 4 + 8 (growth capped at 4*spp)
    oracle = rt.Renderer(
        s.renderer.scene, s.renderer.params, seed=0, backend="pallas"
    )
    np.testing.assert_array_equal(img, oracle.render(spp=14))


def test_motion_resets_accumulation():
    s = _session()
    s.step()
    s.step()
    assert s.samples_at_pose == 6  # 2 + 4 (idle growth)
    s.step("d")  # camera moved: accumulation (and growth) restart
    assert s.samples_at_pose == 2
    s.step()
    assert s.samples_at_pose == 6


def test_converged_idle_stops_dispatching():
    s = _session()
    s.converge_spp = 4
    s.step()
    img_conv = s.step()
    assert s.converged
    seg = s.renderer.segments_traced
    img_again = s.step()  # idle + converged: re-present, no dispatch
    assert s.renderer.segments_traced == seg
    np.testing.assert_array_equal(img_conv, img_again)
    s.step("d")  # motion un-converges
    assert s.samples_at_pose == 2 and not s.converged


def test_pipelined_session_flush_byte_equal():
    """With a fetch pipeline (presentation lags <= ``pipeline`` frames),
    flush() drains in-flight frames and the newest presented image is the
    same byte-exact accumulated mean as the synchronous path."""
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0)
    b.add_lambertian_sphere((0.0, 0.0, -1.0), 0.5, (0.7, 0.3, 0.3))
    scene = b.build()
    params = rt.CameraParameters(
        aspect_ratio=2.0, image_width=64, samples_per_pixel=2, max_depth=3,
        vertical_fov=45.0, defocus_angle=0.0, focus_distance=2.0,
        lookfrom=(0.0, 0.5, 1.5), lookat=(0.0, 0.0, -1.0),
    )
    s = InteractiveSession(
        scene, params, seed=0, backend="pallas", pipeline=2,
        stream=io.StringIO(),
    )
    for _ in range(4):
        s.step()
    img = s.flush()
    assert s.samples_at_pose == 22  # 2 + 4 + 8 + 8 (growth cap 4*spp)
    oracle = rt.Renderer(
        s.renderer.scene, s.renderer.params, seed=0, backend="pallas"
    )
    np.testing.assert_array_equal(img, oracle.render(spp=22))


def test_xla_backend_accumulates_idle_frames_too():
    """The xla path accumulates through render(resume=True): the sample
    SET is identical to a one-shot equal-spp render, but the f32 wave-sum
    regrouping can move the last ulp (renderer.load_checkpoint docstring),
    so a handful of u8 values may sit one quantization step off -- unlike
    the pallas accum path, whose byte-exactness is asserted above."""
    s = _session(backend="xla")
    img = None
    for _ in range(2):
        img = s.step()
    assert s.samples_at_pose == 6  # 2 + 4 (idle growth)
    oracle = rt.Renderer(
        s.renderer.scene, s.renderer.params, seed=0, backend="xla"
    )
    ref = oracle.render(spp=6)
    diff = np.abs(img.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.005, (diff > 0).mean()


def test_quit_key_ends_run():
    s = _session()
    s.handle_key("x")
    assert s.run(max_frames=10) == 0  # already quit: no frames


def test_run_headless_fixed_frames():
    s = _session()
    assert s.run(max_frames=2) == 2
    assert s.frames_rendered == 2


def test_cli_interactive_smoke():
    """--interactive through the real CLI entry point (stdin is a pipe ->
    headless fixed-frame mode).

    The child env pins CPU AND drops the axon sitecustomize from
    PYTHONPATH (same hermetic pattern as test_examples.py): the tunnel
    plugin hangs jax initialization in subprocesses whenever the remote
    worker is down, and CI must not depend on tunnel health."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=repo,
    )
    proc = subprocess.run(
        [
            sys.executable, "-m", "raytracing_tpu",
            "--config", "data/config/world.config.json",
            "--width", "64", "--spp", "1", "--depth", "2",
            "--interactive", "--frames", "1",
        ],
        stdin=subprocess.DEVNULL,
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "interactive session ended after 1 frames" in proc.stdout

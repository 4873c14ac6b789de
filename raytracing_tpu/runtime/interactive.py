"""Interactive rendering session: keyboard camera control on the terminal.

The reference is event-driven: an SDL event pump dispatches each input event
to bound delegates, and ESC quits mid-render
(``/root/reference/src/platform.window.cc:110-140``,
``src/main.cc:869-875``). This environment has no window system, so the
equivalent shell reads raw keystrokes from the terminal: a key-binding table
(the delegate analog) maps keys to camera actions, every frame re-derives
the thin-lens camera (a jit ARGUMENT -- moving it never recompiles) and
presents the progressive render as ANSI half-blocks.

Controls:  a/d orbit  w/s elevate  +/- zoom  r reset  ESC or x quit.

The session logic is deliberately split from the TTY plumbing so tests can
drive ``handle_key``/``step`` directly (tests/test_interactive.py).
"""

from __future__ import annotations

import dataclasses
import math
import sys
import time

import numpy as np

from ..core import camera as rcamera
from . import display as rdisplay
from .renderer import Renderer

ESC = "\x1b"


@dataclasses.dataclass
class OrbitState:
    """Spherical camera rig around the look-at point."""

    azimuth: float          # radians around +y
    elevation: float        # radians above the horizon
    distance: float
    lookat: tuple[float, float, float]

    def lookfrom(self) -> tuple[float, float, float]:
        cx, cy, cz = self.lookat
        ce = math.cos(self.elevation)
        return (
            cx + self.distance * ce * math.cos(self.azimuth),
            cy + self.distance * math.sin(self.elevation),
            cz + self.distance * ce * math.sin(self.azimuth),
        )


def _orbit_from_params(params: rcamera.CameraParameters) -> OrbitState:
    lf = np.asarray(params.lookfrom, np.float64)
    la = np.asarray(params.lookat, np.float64)
    v = lf - la
    dist = float(np.linalg.norm(v))
    return OrbitState(
        azimuth=math.atan2(v[2], v[0]),
        elevation=math.asin(float(v[1]) / max(dist, 1e-9)),
        distance=dist,
        lookat=tuple(float(x) for x in la),
    )


class InteractiveSession:
    """Progressive renderer + key-driven camera (the application-shell
    capability of SURVEY.md section 2H, terminal edition)."""

    AZ_STEP = math.radians(6.0)
    EL_STEP = math.radians(4.0)
    ZOOM = 1.12
    MAX_ELEV = math.radians(85.0)

    def __init__(
        self,
        scene,
        params: rcamera.CameraParameters,
        *,
        seed: int = 0,
        backend: str = "auto",
        spp: int | None = None,
        converge_spp: int | None = None,
        pipeline: int = 0,
        stream=None,
    ) -> None:
        self.params = params
        self.renderer = Renderer(scene, params, seed=seed, backend=backend)
        self.spp = int(spp if spp is not None else params.samples_per_pixel)
        # Converge-while-interactive (the reference's defining UX,
        # main.cc:733-774): while the camera is idle, every frame
        # accumulates ``spp`` MORE samples at the held pose -- the
        # presented image is always the mean over every sample drawn there
        # (byte-identical to a one-shot render at the accumulated spp) --
        # until ``converge_spp`` is reached; camera motion resets the
        # accumulation. The default target comfortably exceeds the
        # reference's shipped 8 spp (world.config.json:5).
        self.converge_spp = (
            int(converge_spp) if converge_spp is not None
            else max(64, self.spp)
        )
        # At least one frame's worth: a <= 0 target would take the
        # converged branch before any image exists (None into the display).
        self.converge_spp = max(self.converge_spp, self.spp, 1)
        self.orbit = _orbit_from_params(params)
        self._orbit0 = dataclasses.replace(self.orbit)
        self._last_pose: tuple | None = None
        self._idle_chunk = self.spp
        self._last_img: np.ndarray | None = None
        # Optional fetch pipeline (``pipeline`` frames in flight): the
        # device->host preview fetch costs a tunnel round trip (~0.1 s)
        # that otherwise serializes behind every dispatch; with pipelining
        # the NEXT frame's dispatch overlaps the previous frame's fetch on
        # a worker thread (same measured-safe pattern as
        # examples/orbit_demo.py -- small payloads overlap fine) and the
        # presentation lags ``pipeline`` frames. 0 = fully synchronous
        # (the tested byte-equality contract presents the current frame).
        self.pipeline = max(int(pipeline), 0)
        self._pool = None
        self._pending: list = []
        if self.pipeline > 0:
            import concurrent.futures

            self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self.display = rdisplay.TerminalDisplay(stream=stream)
        self.frames_rendered = 0
        self.quit = False
        self._t0 = time.perf_counter()
        # Key-binding table: the delegate analog of the reference's
        # per-event bindings (main.cc:861-893).
        self.bindings = {
            "a": self._yaw_left, "d": self._yaw_right,
            "w": self._pitch_up, "s": self._pitch_down,
            "+": self._zoom_in, "=": self._zoom_in,
            "-": self._zoom_out,
            "r": self._reset,
            "x": self._quit, "X": self._quit, ESC: self._quit,
        }

    # -- actions --------------------------------------------------------------
    def _yaw_left(self):
        self.orbit.azimuth -= self.AZ_STEP

    def _yaw_right(self):
        self.orbit.azimuth += self.AZ_STEP

    def _pitch_up(self):
        self.orbit.elevation = min(
            self.orbit.elevation + self.EL_STEP, self.MAX_ELEV
        )

    def _pitch_down(self):
        self.orbit.elevation = max(
            self.orbit.elevation - self.EL_STEP, -self.MAX_ELEV
        )

    def _zoom_in(self):
        self.orbit.distance = max(self.orbit.distance / self.ZOOM, 0.05)

    def _zoom_out(self):
        self.orbit.distance *= self.ZOOM

    def _reset(self):
        self.orbit = dataclasses.replace(self._orbit0)

    def _quit(self):
        self.quit = True

    # -- loop body ------------------------------------------------------------
    def handle_key(self, key: str) -> None:
        """Dispatch one keystroke (unbound keys are ignored, like the
        reference's unhandled SDL events)."""
        action = self.bindings.get(key)
        if action is not None:
            action()

    @property
    def samples_at_pose(self) -> int:
        """Samples accumulated at the current camera pose."""
        if self.renderer.backend == "pallas":
            return self.renderer.frame_accum_samples
        return self.renderer.samples_done

    @property
    def converged(self) -> bool:
        return self.samples_at_pose >= self.converge_spp

    def step(self, keys: str = "") -> np.ndarray | None:
        """Process pending keystrokes, render + present ONE frame.

        With ``pipeline > 0`` the returned image is the newest PRESENTED
        frame, which lags dispatch by up to ``pipeline`` frames -- the
        first calls return None until a frame has been presented (call
        ``flush()`` to drain).

        Moving frames re-point the camera and restart the accumulation;
        idle frames fold ``spp`` more samples into the held pose's running
        mean (converge-while-interactive -- the presented image after k
        idle frames is the byte-identical image of a one-shot render at
        k*spp samples, tested). Once ``converge_spp`` is reached, idle
        frames re-present the converged image without dispatching."""
        for k in keys:
            self.handle_key(k)
        pose = (
            self.orbit.azimuth, self.orbit.elevation, self.orbit.distance,
            self.orbit.lookat,
        )
        if pose != self._last_pose:
            self._last_pose = pose
            params = dataclasses.replace(
                self.params, lookfrom=self.orbit.lookfrom(),
                lookat=self.orbit.lookat,
            )
            self.renderer.params = params
            self.renderer.camera = rcamera.derive(params)
            self._idle_chunk = self.spp
            if self.renderer.backend == "pallas":
                self.renderer.frame_accum_reset()
            else:
                # The xla path accumulates through render(resume=True);
                # reseed (same seed) drops the sums without recompiling.
                self.renderer.reseed(self.renderer.seed)
        remaining = self.converge_spp - self.samples_at_pose
        if remaining > 0:
            # Idle chunks GROW (x2 per consecutive idle frame, capped at
            # 4x the interactive spp): fewer dispatches to the converge
            # target -- each dispatch pays a tunnel round trip -- while
            # the first idle frames stay small so a keystroke interrupts
            # quickly. Sample-set and presented image are decomposition-
            # invariant (absolute RNG keys; byte-equality tested across
            # chunkings), so growth changes timing only.
            cap = max(self.spp, min(self._idle_chunk, 4 * self.spp))
            self._idle_chunk = cap * 2
            chunk = min(cap, remaining)
            if self.renderer.backend == "pallas":
                # Device-side preview fetch: tens of KB per frame at any
                # frame size (a full-frame fetch is what caps large frames
                # -- renderer._frame_preview_step).
                _, prev, total = self.renderer.render_frame_accum_preview(
                    spp=chunk
                )
                if self._pool is not None:
                    # Pipelined: fetch + present on the worker while the
                    # next dispatch proceeds; return the newest PRESENTED
                    # frame (lags <= self.pipeline frames).
                    self._pending.append(
                        self._pool.submit(self._emit, prev, total)
                    )
                    img = self._last_img
                    while len(self._pending) > self.pipeline:
                        img = self._pending.pop(0).result()
                else:
                    img = self._emit(prev, total)
            else:
                img = self.renderer.render(
                    spp=self.samples_at_pose + chunk, resume=True
                )
                self._emit(img, self.samples_at_pose)
        else:
            img = self.flush()
            self._present(img, self.samples_at_pose)
        self.frames_rendered += 1
        return img

    def flush(self) -> np.ndarray | None:
        """Drain any in-flight pipelined frames; returns the newest
        presented image."""
        while self._pending:
            self._last_img = self._pending.pop(0).result()
        return self._last_img

    def _emit(self, img, total: int) -> np.ndarray:
        """Fetch (if a device array) + present one frame labeled with the
        sample count it actually contains. Runs on the pipeline worker
        when pipelining (single worker -> presentation stays ordered)."""
        img = np.asarray(img)
        self._present(img, total)
        self._last_img = img
        return img

    def _present(self, img: np.ndarray, samples: int) -> None:
        from .renderer import RenderProgress

        self.display(
            RenderProgress(
                samples_done=samples,
                samples_total=self.converge_spp,
                pixels_count=self.renderer.pixels_count,
                # Non-blocking counter: a full segments_traced sync would
                # stall the frame pipeline on unfinished device scalars.
                segments_traced=self.renderer.segments_traced_ready,
                elapsed_s=time.perf_counter() - self._t0,
                _preview=lambda im=img: im,
            )
        )
        self.display.stream.write(
            f"converge {samples}/{self.converge_spp} spp  "
            "keys: a/d orbit  w/s elevate  +/- zoom  r reset  "
            "ESC/x quit\x1b[0K\n"
        )
        self.display.stream.flush()

    def run(self, max_frames: int | None = None) -> int:
        """TTY event loop: raw keyboard, render until quit.

        Returns the number of frames rendered. Falls back to a fixed-frame
        non-interactive loop when stdin is not a terminal.
        """
        frames = 0
        if not sys.stdin.isatty():
            n = max_frames if max_frames is not None else 1
            while frames < n and not self.quit:
                self.step()
                frames += 1
            self.flush()
            return frames

        import select
        import termios
        import tty

        fd = sys.stdin.fileno()
        old = termios.tcgetattr(fd)
        try:
            tty.setcbreak(fd)
            while not self.quit and (
                max_frames is None or frames < max_frames
            ):
                keys = []
                while select.select([sys.stdin], [], [], 0)[0]:
                    keys.append(sys.stdin.read(1))
                self.step("".join(keys))
                frames += 1
                if not keys and self.converged:
                    # Fully converged and idle: nothing to trace -- block
                    # briefly on input instead of spinning re-presents.
                    select.select([sys.stdin], [], [], 0.05)
        except KeyboardInterrupt:
            pass  # Ctrl-C == quit (reference: ESC, main.cc:869-875)
        finally:
            termios.tcsetattr(fd, termios.TCSADRAIN, old)
            self.flush()
        return frames

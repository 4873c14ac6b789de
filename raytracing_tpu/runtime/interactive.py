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
        stream=None,
    ) -> None:
        self.params = params
        self.renderer = Renderer(scene, params, seed=seed, backend=backend)
        self.spp = int(spp if spp is not None else params.samples_per_pixel)
        self.orbit = _orbit_from_params(params)
        self._orbit0 = dataclasses.replace(self.orbit)
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

    def step(self, keys: str = "") -> np.ndarray:
        """Process pending keystrokes, render + present ONE frame."""
        for k in keys:
            self.handle_key(k)
        params = dataclasses.replace(
            self.params, lookfrom=self.orbit.lookfrom(),
            lookat=self.orbit.lookat,
        )
        self.renderer.params = params
        self.renderer.camera = rcamera.derive(params)
        if self.renderer.backend == "pallas":
            dev = self.renderer.render_frame(spp=self.spp)
            img = self.renderer.fetch_image(dev)
        else:
            img = self.renderer.render(spp=self.spp)
        self.frames_rendered += 1
        self._present(img)
        return img

    def _present(self, img: np.ndarray) -> None:
        from .renderer import RenderProgress

        self.display(
            RenderProgress(
                samples_done=self.spp,
                samples_total=self.spp,
                pixels_count=self.renderer.pixels_count,
                segments_traced=self.renderer.segments_traced,
                elapsed_s=time.perf_counter() - self._t0,
                _preview=lambda im=img: im,
            )
        )
        self.display.stream.write(
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
        except KeyboardInterrupt:
            pass  # Ctrl-C == quit (reference: ESC, main.cc:869-875)
        finally:
            termios.tcsetattr(fd, termios.TCSADRAIN, old)
        return frames

"""Golden-image regression: a fixed deterministic scene must render
bit-identically forever (catches silent drift in camera math, intersection,
scatter, color pipe, or the slot/tile plumbing).

Two goldens, both 64x32 @ 1 spp with a fixed seed:
  * XLA backend (threefry camera jitter -- deterministic on every platform).
  * Pallas backend (counter-based software hash RNG: the draws are plain
    int32 vector arithmetic, bit-identical under TPU-interpret mode on CPU
    and compiled Mosaic on hardware -- this golden is valid on BOTH).

Regenerate (only after an INTENDED image change, and say why in the commit):
  python tests/test_golden.py --regen
"""

import os
import sys

import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.scene.types import SceneBuilder
from raytracing_tpu.utils import png

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _scene():
    b = SceneBuilder()
    b.add_metallic_sphere((0.0, -100.5, -1.0), 100.0, (0.5, 0.5, 0.5), 0.0)
    b.add_lambertian_sphere((0.0, 0.0, -1.2), 0.5, (0.7, 0.3, 0.3))
    b.add_metallic_sphere((1.1, 0.0, -1.4), 0.5, (0.9, 0.9, 0.9), 0.0)
    b.add_dielectric_sphere((-1.1, 0.0, -1.2), 0.5, 1.5)
    return b.build()


def _params():
    return rt.CameraParameters(
        aspect_ratio=2.0,
        image_width=64,
        samples_per_pixel=1,
        max_depth=6,
        vertical_fov=55.0,
        defocus_angle=0.0,
        focus_distance=1.0,
        lookfrom=(0.0, 0.3, 1.2),
        lookat=(0.0, 0.0, -1.2),
    )


def _render(backend):
    r = rt.Renderer(_scene(), _params(), seed=11, backend=backend)
    return r.render(spp=1)


def test_golden_xla():
    img = _render("xla")
    want = png.read_png(os.path.join(GOLDEN_DIR, "mini_xla.png"))
    np.testing.assert_array_equal(img, want)


def test_golden_pallas_interpret():
    img = _render("pallas")
    want = png.read_png(os.path.join(GOLDEN_DIR, "mini_pallas.png"))
    np.testing.assert_array_equal(img, want)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        png.write_png(os.path.join(GOLDEN_DIR, "mini_xla.png"), _render("xla"))
        png.write_png(
            os.path.join(GOLDEN_DIR, "mini_pallas.png"), _render("pallas")
        )
        print("goldens regenerated in", GOLDEN_DIR)

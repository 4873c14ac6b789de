"""Device-mesh construction for sharded rendering.

The TPU-native replacement for the reference's thread-pool sizing
(``/root/reference/src/main.cc:608-614``: ``hardware_concurrency()`` minus 2):
here the "workers" are TPU chips in a ``jax.sharding.Mesh`` with two axes:

  * ``px``  -- data parallelism over the image plane (the analog of the
    reference's tile decomposition, ``main.cc:615-633``; SURVEY.md section 2E).
  * ``spp`` -- sample-axis parallelism: devices trace disjoint sample ranges
    of the SAME pixels and psum their partial radiance sums (the legitimate
    "sequence parallel" analog per SURVEY.md section 5.7).

Static balanced sharding replaces the reference's shuffled dynamic queue --
every (pixel, sample) costs roughly the same, so no work stealing is needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_PIXELS = "px"
AXIS_SAMPLES = "spp"


def make_mesh(
    devices: list | None = None,
    *,
    sample_axis: int = 1,
) -> Mesh:
    """Build a ``(px, spp)`` mesh over the given (default: all) devices.

    ``sample_axis`` devices are dedicated to sample-splitting; the rest shard
    pixels. ``sample_axis`` must divide the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % sample_axis != 0:
        raise ValueError(
            f"sample_axis={sample_axis} must divide device count {n}"
        )
    arr = np.asarray(devices).reshape(n // sample_axis, sample_axis)
    return Mesh(arr, (AXIS_PIXELS, AXIS_SAMPLES))

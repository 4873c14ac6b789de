"""Sharded rendering: ``shard_map`` over the (px, spp) device mesh.

TPU-native replacement for the reference's communication layer (SURVEY.md
section 5.8): the per-pixel ZeroMQ data plane (``main.cc:511-515``,
``288-345``) becomes XLA collectives riding ICI --

  * pixel shards stay resident per device (no gather needed until display),
  * sample-split partial sums are combined with one ``psum`` over the ``spp``
    axis (replacing the reference's single-writer message drain,
    ``main.cc:733-774``).

Because the RNG is keyed by global ray id (core/rng.py), the sharded render
draws exactly the same sample set as the single-device render for any mesh
shape; radiance agrees to float ULP noise (different XLA programs fuse/fma in
different orders). Tested in tests/test_sharding.py on a forced 8-device CPU
platform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core import camera as rcamera
from ..models import integrator
from ..scene.types import Scene
from .mesh import AXIS_PIXELS, AXIS_SAMPLES


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


@functools.partial(
    jax.jit,
    static_argnames=("chunk_samples", "spp", "max_depth", "mesh", "use_matmul"),
)
def render_pixels_sharded(
    scene: Scene,
    cam: rcamera.DerivedCamera,
    base_key: jax.Array,
    pixel_ids: jnp.ndarray,
    sample_start: jnp.ndarray,
    chunk_samples: int,
    spp: int,
    max_depth: int,
    mesh: Mesh,
    use_matmul: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded equivalent of ``integrator.render_pixels``.

    ``pixel_ids`` (length divisible by the ``px`` axis size) is sharded over
    ``px``; the ``chunk_samples`` sample indices are split across the ``spp``
    axis (each device traces ``ceil(chunk/n_spp)`` samples, masked at the
    true boundary) and reduced with ``psum``. The scene/camera/key are
    replicated.

    Returns ``(radiance_sum[P, 3] sharded over px, segments scalar)``
    where ``segments`` counts every traced segment across the mesh.
    """
    n_spp = mesh.shape[AXIS_SAMPLES]
    local_chunk = _ceil_div(chunk_samples, n_spp)

    def local_fn(scene, cam, base_key, pixel_ids_local, sample_start):
        sp_idx = jax.lax.axis_index(AXIS_SAMPLES)
        local_start = sample_start + sp_idx * local_chunk
        rad, segments = integrator.render_pixels(
            scene,
            cam,
            base_key,
            pixel_ids_local,
            local_start,
            local_chunk,
            spp,
            max_depth,
            sample_limit=sample_start + chunk_samples,
            use_matmul=use_matmul,
        )
        rad = jax.lax.psum(rad, AXIS_SAMPLES)
        segments = jax.lax.psum(segments, (AXIS_PIXELS, AXIS_SAMPLES))
        return rad, segments

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS_PIXELS), P()),
        out_specs=(P(AXIS_PIXELS), P()),
    )(scene, cam, base_key, pixel_ids, sample_start)

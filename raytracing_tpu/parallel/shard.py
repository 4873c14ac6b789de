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


@functools.partial(
    jax.jit,
    static_argnames=("num_slots", "mesh", "pixel_order", "interpret"),
)
def render_pixels_fused_sharded(
    scene: Scene,
    cam: rcamera.DerivedCamera,
    slot_base: jnp.ndarray,
    seed: jnp.ndarray,
    sample_start: jnp.ndarray,
    chunk_spp: jnp.ndarray,
    max_depth: jnp.ndarray,
    num_slots: int,
    mesh: Mesh,
    pixel_order: str = "tiled",
    interpret: bool = False,
    done: jnp.ndarray | None = None,
    t_end: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, ...]:
    """Regen megakernel under ``shard_map``: the multi-chip flagship path.

    Work decomposition over the (px, spp) mesh:
      * slots (pixels) split contiguously over ``px`` -- each device runs the
        fused kernel on its own ``num_slots / n_px`` slots (slot->pixel
        mapping stays global via per-device ``slot_base`` offsets);
      * the sample budget splits over ``spp`` as evenly as possible: shard k
        traces the absolute sample range
        ``[sample_start + k*chunk//n, sample_start + (k+1)*chunk//n)``,
        partial sums combined with one ``psum`` riding ICI.

    The kernel RNG is keyed by (slot, absolute sample), so every mesh shape
    -- including the unsharded single kernel -- traces the IDENTICAL sample
    set; radiance agrees to f32 summation-order roundoff and segment counts
    match exactly. Returns
    ``(radiance_sum[num_slots, 3] sharded over px, segments)``.

    Work-ahead regen (round 4 -- the multi-chip analog of the single-device
    straggler-tail fix, ``trace._regen_kernel``): with ``done``/``t_end``,
    ``chunk_spp`` is instead the FULL per-slot sample budget. Each ``spp``
    shard ``s`` permanently owns the absolute sample range
    ``[sample_start + s*budget//n, sample_start + (s+1)*budget//n)`` and
    carries its own per-slot done counts across waves, so lanes finishing a
    wave's target early keep tracing their shard's later samples instead of
    idling until the tile's slowest lane finishes. ``t_end`` is the GLOBAL
    cumulative per-slot target (across all shards); it is apportioned to
    shard ``s`` as ``t*(s+1)//n - t*s//n`` clamped to the shard's own budget
    -- monotone pacing whose final wave (``t_end == budget``) completes every
    shard exactly. ``done`` is the global ``(n_sp * num_slots/128, 128)``
    int32 array sharded over (spp, px); shard ``s``'s counts are LOCAL to
    its range (0 .. its budget share). The union of shard ranges is exactly
    ``[sample_start, sample_start + budget)``, so the sample set -- and the
    in-kernel exact segment accounting -- is identical to the unsharded and
    the self-contained-wave decompositions. Returns a third value: the
    updated done array to thread into the next wave.
    """
    from ..ops.pallas import trace as ptrace
    from ..runtime import tiling as rtiling

    n_px = mesh.shape[AXIS_PIXELS]
    n_sp = mesh.shape[AXIS_SAMPLES]
    tile = ptrace.DEFAULT_TILE_RAYS
    if num_slots % (n_px * tile) != 0:
        raise ValueError(
            f"num_slots {num_slots} must divide over {n_px} px shards in "
            f"multiples of the {tile}-slot kernel tile"
        )
    work_ahead = done is not None
    if work_ahead and t_end is None:
        raise ValueError("work-ahead needs both done and t_end")
    local_slots = num_slots // n_px
    if pixel_order == "tiled":
        map_param = rtiling.tiles_per_row(cam.image_width)
    else:
        map_param = cam.image_width

    def local_fn(scene, cam, slot_base, seed, sample_start, chunk_spp,
                 max_depth, *wa):
        px_idx = jax.lax.axis_index(AXIS_PIXELS)
        sp_idx = jax.lax.axis_index(AXIS_SAMPLES)
        base = slot_base + px_idx * jnp.int32(local_slots)
        # chunk_spp is the wave's chunk (self-contained mode) or the FULL
        # per-slot budget (work-ahead mode); either way shard s owns its
        # fair contiguous slice of it.
        lo = (chunk_spp * sp_idx) // n_sp
        hi = (chunk_spp * (sp_idx + 1)) // n_sp
        local_spp = (hi - lo).astype(jnp.int32)
        kwargs = dict(pixel_order=pixel_order, interpret=interpret)
        if work_ahead:
            done_local, t_target = wa
            # Shard-local cumulative target: fair split of the global
            # target, clamped to this shard's own budget share (the clamp
            # only matters for off-by-one floor wobble; the final wave's
            # t_target == budget hits local_spp exactly).
            u = (
                (t_target * (sp_idx + 1)) // n_sp
                - (t_target * sp_idx) // n_sp
            ).astype(jnp.int32)
            kwargs.update(done=done_local, t_end=jnp.minimum(u, local_spp))
        out = ptrace._render_pixels_fused(
            scene,
            cam.pixel00,
            cam.pixel_delta_u,
            cam.pixel_delta_v,
            cam.center,
            cam.defocus_disk_u,
            cam.defocus_disk_v,
            cam.defocus_angle,
            jnp.int32(map_param),
            base,
            seed,
            sample_start + lo.astype(jnp.int32),
            local_slots,
            local_spp,
            max_depth,
            **kwargs,
        )
        rad = jax.lax.psum(out[0], AXIS_SAMPLES)
        seg = jax.lax.psum(out[1], (AXIS_PIXELS, AXIS_SAMPLES))
        if work_ahead:
            return rad, seg, out[2]
        return rad, seg

    in_specs = [P(), P(), P(), P(), P(), P(), P()]
    out_specs = [P(AXIS_PIXELS), P()]
    args = (scene, cam, slot_base, seed, sample_start, chunk_spp, max_depth)
    if work_ahead:
        # done rows: spp-shard major, px-shard minor -- each device sees its
        # own (local_slots/128, 128) block; no collective touches it.
        in_specs += [P((AXIS_SAMPLES, AXIS_PIXELS)), P()]
        out_specs += [P((AXIS_SAMPLES, AXIS_PIXELS))]
        args += (done, t_end)
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        # pallas_call out_shapes carry no varying-mesh-axes metadata; the
        # kernel is per-device-independent by construction.
        check_vma=False,
    )(*args)

"""Render orchestrator: chunked progressive accumulation on device.

TPU-native replacement for the reference's execution engine
(``/root/reference/src/main.cc:404-782``): the worker threads, mutex'd tile
queue (``MonkaGigaQueue``, ``main.cc:409-427``), per-pixel ZeroMQ messages
(``main.cc:511-515``) and render-thread message pump (``main.cc:733-774``)
collapse into a loop of jitted device steps:

  * Work decomposition: instead of shuffled 8x8 pixel tiles (``main.cc:
    615-633``), work is decomposed into (pixel-block x sample-chunk) waves
    sized to a target ray-batch; no shuffling/queueing is needed because the
    decomposition is statically balanced.
  * Result delivery: instead of one serialized message per traced pixel (the
    reference's biggest inefficiency -- SURVEY.md section 5.8), radiance sums
    accumulate in a device-resident framebuffer; the host fetches a preview
    image only when the progress callback asks for one (chunked device->host
    readback).
  * Progress metrics: ``pixels_count`` / ``pixels_raytraced`` /
    ``render_time`` mirror the ``RayTracer`` metric API (``main.cc:547-566``)
    that feeds the reference's UI progress bars (``main.cc:378-388``).

The accumulator holds radiance SUMS so rendering is resumable / progressively
refinable: the displayable image at any point is ``sums / samples_done``
through the gamma+quantize pipe -- a capability the reference lacks
(SURVEY.md section 5.4).
"""

from __future__ import annotations

import dataclasses
import functools
import threading
import time
from typing import Callable

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from ..core import camera as rcamera
from ..core import color as rcolor
from ..models import integrator
from ..parallel import shard as rshard
from ..scene.types import Scene
from ..ops.pallas.trace import DEFAULT_TILE_RAYS
from . import tiling as rtiling

ProgressCallback = Callable[["RenderProgress"], None]

# Adaptive wave sizing targets this much wall clock per dispatch: long
# enough to amortize tunnel dispatch latency (~0.1 s) and straggler lanes,
# an order of magnitude below the remote watchdog that kills overlong
# dispatches (a ~140 s wave crashed the TPU worker).
_WAVE_TARGET_S = 15.0


@dataclasses.dataclass
class RenderProgress:
    """Snapshot handed to progress callbacks (the analog of the reference's
    UI progress state, ``main.cc:360-402``)."""

    samples_done: int
    samples_total: int
    pixels_count: int
    segments_traced: int
    elapsed_s: float
    _preview: Callable[[], np.ndarray]

    @property
    def fraction(self) -> float:
        return self.samples_done / max(self.samples_total, 1)

    @property
    def pixels_raytraced(self) -> int:
        """Pixel-equivalents completed (== fraction * pixel count); the
        reference counts whole delivered pixels (``main.cc:761``), ours
        converge all pixels together sample-chunk by sample-chunk."""
        return int(self.fraction * self.pixels_count)

    def preview(self) -> np.ndarray:
        """Fetch the current converged-so-far uint8 RGB image (device->host)."""
        return self._preview()


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk_samples", "spp", "max_depth", "use_matmul", "mesh", "backend",
        "pixel_order",
    ),
    # NOT donated: self._image_sum must stay fetchable mid-wave so Ctrl-C /
    # checkpointing can persist the last completed chunk.
)
def _accumulate_step(
    image_sum: jnp.ndarray,
    scene: Scene,
    cam: rcamera.DerivedCamera,
    base_key: jax.Array,
    pixel_ids: jnp.ndarray,
    sample_start: jnp.ndarray,
    chunk_samples: int,
    spp: int,
    max_depth: int,
    use_matmul: bool,
    mesh=None,
    backend: str = "xla",
    pallas_seed: jnp.ndarray | None = None,
    pixel_order: str = "linear",
    slot_base: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One wave: trace (pixel block) x (sample chunk), scatter-add into the
    device framebuffer. ``image_sum`` has one trailing spill row so padded
    pixel ids (== num_pixels) land harmlessly outside the image. With a mesh,
    the wave is sharded over (px, spp) device axes."""
    if mesh is None:
        rad_sum, segments = integrator.render_pixels(
            scene,
            cam,
            base_key,
            pixel_ids,
            sample_start,
            chunk_samples,
            spp,
            max_depth,
            use_matmul=use_matmul,
            backend=backend,
            pallas_seed=pallas_seed,
            pixel_order=pixel_order,
            slot_base=slot_base,
        )
    else:
        rad_sum, segments = rshard.render_pixels_sharded(
            scene,
            cam,
            base_key,
            pixel_ids,
            sample_start,
            chunk_samples,
            spp,
            max_depth,
            mesh,
            use_matmul,
        )
    image_sum = image_sum.at[pixel_ids].add(rad_sum)
    return image_sum, segments


@functools.partial(
    jax.jit,
    static_argnames=("num_slots", "pixel_order", "mesh", "interpret"),
    # NOT donated: see _accumulate_step.
)
def _accumulate_step_pallas(
    image_sum: jnp.ndarray,
    scene: Scene,
    cam: rcamera.DerivedCamera,
    map_param: jnp.ndarray,
    slot_base: jnp.ndarray,
    pallas_seed: jnp.ndarray,
    sample_start: jnp.ndarray,
    chunk_spp: jnp.ndarray,
    max_depth: jnp.ndarray,
    num_slots: int,
    pixel_order: str,
    mesh=None,
    interpret: bool = False,
    done=None,
    t_end=None,
):
    """One regen-megakernel wave (all pixel slots x a dynamic sample chunk).

    ``chunk_spp``/``max_depth`` are runtime scalars so varying chunk sizes
    never recompile (the kernel's loop bounds are data-dependent anyway).
    ``sample_start`` is the wave's absolute first-sample index (the kernel
    RNG is (slot, sample)-keyed, so any chunk decomposition draws the same
    sample set). With a mesh, the wave is sharded over (px, spp) axes.

    Work-ahead regen: with ``done``/``t_end``, ``chunk_spp`` is the
    ABSOLUTE per-slot budget cap and the call returns
    ``(image_sum, segments, done_out)`` -- see
    ``trace._render_pixels_fused``. With a mesh, each ``spp`` shard owns a
    contiguous slice of the budget and carries its own per-slot done block
    (``shard.render_pixels_fused_sharded``); ``t_end`` stays the GLOBAL
    cumulative target and ``done`` the (n_sp * rows, 128) global array.

    ``image_sum`` lives in SLOT order (the kernel's work order), so
    accumulation is a pure elementwise add -- no device scatter. The host
    reorders slots -> pixels only when an image is actually fetched
    (runtime/tiling.py mapping)."""
    from ..ops.pallas import trace as ptrace

    if mesh is not None:
        out = rshard.render_pixels_fused_sharded(
            scene,
            cam,
            slot_base,
            pallas_seed,
            sample_start,
            chunk_spp,
            max_depth,
            num_slots,
            mesh,
            pixel_order=pixel_order,
            interpret=interpret,
            done=done,
            t_end=t_end,
        )
        if done is not None:
            rad_sum, segments, done_out = out
            return image_sum + rad_sum, segments, done_out
        rad_sum, segments = out
    else:
        out = ptrace._render_pixels_fused(
            scene,
            cam.pixel00,
            cam.pixel_delta_u,
            cam.pixel_delta_v,
            cam.center,
            cam.defocus_disk_u,
            cam.defocus_disk_v,
            cam.defocus_angle,
            map_param,
            slot_base,
            pallas_seed,
            sample_start,
            num_slots,
            chunk_spp,
            max_depth,
            done=done,
            t_end=t_end,
            pixel_order=pixel_order,
            interpret=interpret,
        )
        if done is not None:
            rad_sum, segments, done_out = out
            return image_sum + rad_sum, segments, done_out
        rad_sum, segments = out
    image_sum = image_sum + rad_sum
    return image_sum, segments


@functools.partial(
    jax.jit,
    static_argnames=("num_slots", "pixel_order", "interpret"),
)
def _frame_step(
    scene: Scene,
    cam: rcamera.DerivedCamera,
    map_param: jnp.ndarray,
    pallas_seed: jnp.ndarray,
    sample_start: jnp.ndarray,
    spp: jnp.ndarray,
    max_depth: jnp.ndarray,
    num_slots: int,
    pixel_order: str,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot interactive frame: trace + tonemap fused into a single
    dispatch (no accumulation buffer). Returns (u8 slots, segments)."""
    from ..ops.pallas import trace as ptrace

    rad_sum, segments = ptrace._render_pixels_fused(
        scene,
        cam.pixel00,
        cam.pixel_delta_u,
        cam.pixel_delta_v,
        cam.center,
        cam.defocus_disk_u,
        cam.defocus_disk_v,
        cam.defocus_angle,
        map_param,
        jnp.int32(0),
        pallas_seed,
        sample_start,
        num_slots,
        spp,
        max_depth,
        pixel_order=pixel_order,
        interpret=interpret,
    )
    inv = 1.0 / jnp.maximum(spp.astype(jnp.float32), 1.0)
    return rcolor.rgb_to_u8(rad_sum * inv), segments


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_slots", "pixel_order", "height", "width", "ph", "pw",
        "interpret",
    ),
)
def _frame_preview_step(
    scene: Scene,
    cam: rcamera.DerivedCamera,
    map_param: jnp.ndarray,
    pallas_seed: jnp.ndarray,
    sample_start: jnp.ndarray,
    spp: jnp.ndarray,
    max_depth: jnp.ndarray,
    slot_ids: jnp.ndarray,
    num_slots: int,
    pixel_order: str,
    height: int,
    width: int,
    ph: int,
    pw: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``_frame_step`` plus a DEVICE-side (ph, pw) box-downsampled preview.

    The interactive bottleneck at large frames is the device->host fetch:
    the remote-TPU tunnel moves ~1 MB in ~60-110 ms and a CONCURRENT
    full-frame readback collapses the dispatch pipeline (CLAUDE.md). A
    live display only needs terminal-cell resolution, so the slot->pixel
    reorder + box filter run on device and the per-frame fetch drops to
    tens of KB (which DOES overlap dispatch safely). Returns
    (u8 slots, u8 preview [ph, pw, 3], segments); fetch the full slots
    only when recording.
    """
    u8, segments = _frame_step(
        scene, cam, map_param, pallas_seed, sample_start, spp, max_depth,
        num_slots, pixel_order, interpret,
    )
    return u8, _device_preview(u8, slot_ids, height, width, ph, pw), segments


def _device_preview(
    u8: jnp.ndarray,
    slot_ids: jnp.ndarray,
    height: int,
    width: int,
    ph: int,
    pw: int,
) -> jnp.ndarray:
    """Slot->pixel reorder + (ph, pw) box downsample, all on device (traced
    inside the frame steps). At factors of 1 (small frames) this is an
    exact identity reorder.

    Ceil box factors + edge padding so the preview covers the WHOLE
    frame (floor factors + crop silently dropped the right/bottom edge
    whenever the frame is not a multiple of the preview size -- at
    800x470 with a 240x136 preview that cut 62 rows and 80 columns).
    The caller shrinks (ph, pw) to ceil(h/fy) x ceil(w/fx) so at most
    fy-1 / fx-1 replicated edge rows/cols enter the last preview cell."""
    num_pixels = height * width
    ids = jnp.minimum(slot_ids, num_pixels)  # padded slots -> spill row
    fb = jnp.zeros((num_pixels + 1, 3), jnp.uint8).at[ids].set(u8)
    img = fb[:-1].reshape(height, width, 3)
    fy = -(-height // ph)
    fx = -(-width // pw)
    ch, cw = ph * fy, pw * fx
    padded = jnp.pad(
        img, ((0, ch - height), (0, cw - width), (0, 0)), mode="edge"
    ).astype(jnp.float32)
    ds = padded.reshape(ph, fy, pw, fx, 3).mean(axis=(1, 3))
    return (ds + 0.5).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("num_slots", "pixel_order", "fresh", "interpret"),
)
def _frame_accum_step(
    frame_sum: jnp.ndarray,
    scene: Scene,
    cam: rcamera.DerivedCamera,
    map_param: jnp.ndarray,
    pallas_seed: jnp.ndarray,
    sample_start: jnp.ndarray,
    spp: jnp.ndarray,
    max_depth: jnp.ndarray,
    total: jnp.ndarray,
    num_slots: int,
    pixel_order: str,
    fresh: bool,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Converge-while-interactive frame: trace ``spp`` fresh samples
    starting at absolute sample ``sample_start``, fold them into the
    per-pose radiance-sum buffer, and tonemap the accumulated mean -- one
    fused dispatch, no sync. This is the capability the reference's live
    window has (the render thread drains pixels into the displayed
    framebuffer every frame while workers keep tracing,
    ``/root/reference/src/main.cc:733-774``,
    ``src/ray.tracer.image.display.cc:108-117``): an idle camera visibly
    refines instead of re-presenting single-frame noise.

    ``fresh`` (static) starts a new accumulation -- the stale buffer is
    ignored, not re-zeroed, so a camera-motion reset costs nothing.
    ``total`` is the absolute sample count AFTER this frame; the displayed
    mean divides by it exactly the way ``render()`` normalizes (f32
    reciprocal of an int32 count), so k accumulated frames present the
    byte-identical image of a single ``render(spp=total)``.
    Returns (frame_sum, u8 slots, segments)."""
    from ..ops.pallas import trace as ptrace

    rad_sum, segments = ptrace._render_pixels_fused(
        scene,
        cam.pixel00,
        cam.pixel_delta_u,
        cam.pixel_delta_v,
        cam.center,
        cam.defocus_disk_u,
        cam.defocus_disk_v,
        cam.defocus_angle,
        map_param,
        jnp.int32(0),
        pallas_seed,
        sample_start,
        num_slots,
        spp,
        max_depth,
        pixel_order=pixel_order,
        interpret=interpret,
    )
    frame_sum = rad_sum if fresh else frame_sum + rad_sum
    inv = 1.0 / jnp.maximum(total, 1).astype(jnp.float32)
    return frame_sum, _slots_to_u8(frame_sum, inv), segments


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_slots", "pixel_order", "fresh", "height", "width", "ph", "pw",
        "interpret",
    ),
)
def _frame_accum_preview_step(
    frame_sum: jnp.ndarray,
    scene: Scene,
    cam: rcamera.DerivedCamera,
    map_param: jnp.ndarray,
    pallas_seed: jnp.ndarray,
    sample_start: jnp.ndarray,
    spp: jnp.ndarray,
    max_depth: jnp.ndarray,
    total: jnp.ndarray,
    slot_ids: jnp.ndarray,
    num_slots: int,
    pixel_order: str,
    fresh: bool,
    height: int,
    width: int,
    ph: int,
    pw: int,
    interpret: bool = False,
):
    """``_frame_accum_step`` plus the device-side downsampled preview (the
    per-frame fetch stays tens of KB -- see ``_frame_preview_step``).
    Returns (frame_sum, u8 slots, u8 preview, segments)."""
    frame_sum, u8, segments = _frame_accum_step(
        frame_sum, scene, cam, map_param, pallas_seed, sample_start, spp,
        max_depth, total, num_slots, pixel_order, fresh, interpret,
    )
    return (
        frame_sum, u8, _device_preview(u8, slot_ids, height, width, ph, pw),
        segments,
    )


def _to_u8(image_sum: jnp.ndarray, inv_samples: float, height: int, width: int) -> jnp.ndarray:
    mean = image_sum[:-1] * jnp.float32(inv_samples)
    return rcolor.rgb_to_u8(mean).reshape(height, width, 3)


def _slots_to_u8(slot_sum: jnp.ndarray, inv_samples) -> jnp.ndarray:
    """``inv_samples``: scalar 1/spp, or a per-slot ``(rows, 1)`` array when
    work-ahead regen has accumulated different sample counts per slot."""
    return rcolor.rgb_to_u8(slot_sum * jnp.asarray(inv_samples, jnp.float32))


def _slots_to_image(
    slot_u8: np.ndarray, all_ids: np.ndarray, num_pixels: int,
    height: int, width: int,
) -> np.ndarray:
    """Host-side slot->pixel reorder (spill slots dropped)."""
    img = np.zeros((num_pixels, 3), np.uint8)
    valid = all_ids < num_pixels
    img[all_ids[valid]] = slot_u8[valid]
    return img.reshape(height, width, 3)


class Renderer:
    """Progressive renderer for one scene + camera (the ``RayTracer`` analog,
    ``main.cc:526-567``)."""

    def __init__(
        self,
        scene: Scene,
        camera_params: rcamera.CameraParameters,
        *,
        seed: int = 0,
        max_rays_per_batch: int = 1 << 20,
        use_matmul: bool = True,
        mesh=None,
        backend: str = "auto",
    ) -> None:
        self.scene = scene
        self.params = camera_params
        self.camera = rcamera.derive(camera_params)
        self.seed = seed
        self.base_key = jr.key(seed)
        self.max_rays_per_batch = int(max_rays_per_batch)
        self.use_matmul = use_matmul
        self.mesh = mesh
        if backend == "auto":
            # Fused Pallas megakernel on TPU; portable XLA wavefront elsewhere.
            platform = jax.devices()[0].platform
            backend = "pallas" if platform in ("tpu", "axon") else "xla"
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        # Pallas kernels need interpret mode off-TPU (CPU mesh simulation).
        self._pallas_interpret = jax.devices()[0].platform not in (
            "tpu", "axon"
        )

        self._samples_done = 0
        self._segments = 0
        self._pending_segments: list = []
        # Guards _segments/_pending_segments: the interactive pipeline's
        # worker thread drains ready segment scalars (_present ->
        # segments_traced_ready) concurrently with main-thread reads.
        self._seg_lock = threading.Lock()
        self._start_time: float | None = None
        self._end_time: float | None = None
        self._elapsed_base = 0.0
        self._tiles_counter = 0
        self._frame_sample_base = 0
        # Converge-while-interactive state: per-pose radiance-sum buffer +
        # absolute accumulated-sample count (render_frame_accum*).
        self._frame_accum_sum: jnp.ndarray | None = None
        self._frame_accum_count = 0
        self._image_sum: jnp.ndarray | None = None
        # Per-slot completed-sample counts (work-ahead regen; None until a
        # pallas render runs). Unsharded: one (rows, 128) block of absolute
        # counts. Sharded: n_sp stacked blocks, shard s's counts LOCAL to
        # its contiguous budget slice (see shard.render_pixels_fused_sharded)
        # -- _done_budget records the spp whose split laid them out.
        self._done: jnp.ndarray | None = None
        self._done_budget: int | None = None
        # Measured spp/s of the last adaptive wave (this scene + camera).
        # Persists across render() calls and reseed() so repeat renders
        # size their FIRST wave from evidence instead of paying the 8-spp
        # probe wave again -- small waves are straggler-tail-expensive
        # (a wave's kernel programs run until EVERY lane finishes its
        # chunk, and the per-lane sample-sum sigma makes the stale-lane
        # tail scale like 1/sqrt(chunk_spp); measured loop floor 5.03
        # cyc/segment vs 8.2 end-to-end at 8+56-spp waves,
        # scripts/probe_segment_split.py).
        self._wave_rate: float | None = None

    # -- metric API parity with RayTracer (main.cc:547-566) -----------------
    @property
    def pixels_count(self) -> int:
        return self.camera.image_width * self.camera.image_height

    @property
    def pixels_raytraced(self) -> int:
        return int(self.fraction_done * self.pixels_count)

    @property
    def samples_done(self) -> int:
        return self._samples_done

    @property
    def segments_traced(self) -> int:
        """Total ray segments traced (denominator for Mrays/s). Blocks
        until every dispatched wave's segment scalar is available."""
        with self._seg_lock:
            if self._pending_segments:
                pending, self._pending_segments = self._pending_segments, []
                self._segments += int(sum(int(s) for s in pending))
            return self._segments

    @property
    def segments_traced_ready(self) -> int:
        """``segments_traced`` without blocking: folds in only the pending
        per-wave segment scalars whose device values are already available
        (each ``int()`` of an unfinished scalar would cost a tunnel round
        trip -- the interactive display must never stall the frame
        pipeline). The count catches up as dispatches complete."""
        with self._seg_lock:
            pend = self._pending_segments
            while pend:
                h = pend[0]
                try:
                    if not h.is_ready():
                        break
                except AttributeError:  # non-jax scalar (tests, xla path)
                    break
                pend.pop(0)
                self._segments += int(h)
            return self._segments

    @property
    def fraction_done(self) -> float:
        spp = getattr(self, "_spp_target", None)
        if not spp:
            return 0.0
        return min(self._samples_done / spp, 1.0)

    def reseed(self, seed: int) -> None:
        """Point this renderer at a fresh RNG stream for the next render.

        Keeps compiled executables AND the measured wave rate (so repeat
        renders -- e.g. bench.py's seed-varied best-of-N -- skip the 8-spp
        probe wave), but drops any accumulated image: a reseeded render
        cannot be resumed from the previous seed's partial sums (the RNG
        is keyed by (slot, sample) under ONE seed)."""
        self.seed = int(seed)
        self.base_key = jr.key(self.seed)
        self._image_sum = None
        self._samples_done = 0
        self._segments = 0
        self._pending_segments = []
        self._elapsed_base = 0.0
        self._tiles_counter = 0
        self._frame_sample_base = 0
        self._frame_accum_sum = None
        self._frame_accum_count = 0
        self._done = None
        self._done_budget = None

    # -- work-ahead done bookkeeping (shapes depend on the mesh) -------------
    def _work_ahead_shards(self) -> int:
        """Stacked done blocks: one per spp mesh shard (1 unsharded)."""
        return self.mesh.shape["spp"] if self.mesh is not None else 1

    def _prefix_done_np(self, rows: int, k: int, budget: int) -> np.ndarray:
        """Done counts for a state whose completed set is the absolute
        sample prefix ``[0, k)``, laid out under a ``budget``-sample split:
        shard ``s`` owns the contiguous slice ``[s*budget//n, (s+1)*
        budget//n)``, so a prefix fills each shard's own local prefix."""
        n_sp = self._work_ahead_shards()
        if n_sp == 1:
            return np.full((rows, 128), k, np.int32)
        blocks = []
        for s in range(n_sp):
            lo = (budget * s) // n_sp
            hi = (budget * (s + 1)) // n_sp
            blocks.append(
                np.full((rows, 128), min(max(k - lo, 0), hi - lo), np.int32)
            )
        return np.concatenate(blocks, axis=0)

    def _per_slot_done(self, done_dev: jnp.ndarray) -> jnp.ndarray:
        """``(slots, 1)`` per-slot completed-sample counts -- the sum of the
        spp shards' local blocks under a mesh (split-independent, so valid
        for normalization whatever budget laid the blocks out)."""
        if self._work_ahead_shards() > 1:
            done_dev = done_dev.reshape(
                self._work_ahead_shards(), -1, 128
            ).sum(axis=0)
        return done_dev.reshape(-1, 1)

    def render_time(self) -> float:
        """Elapsed wall-clock seconds (running timer until complete, then
        frozen -- semantics of ``main.cc:563-566, 771-773``). Across a
        checkpoint/resume, includes the previous runs' render time."""
        if self._start_time is None:
            return self._elapsed_base
        end = self._end_time if self._end_time is not None else time.perf_counter()
        return self._elapsed_base + (end - self._start_time)

    # -- work decomposition --------------------------------------------------
    def _plan(
        self, spp: int, total_slots: int, has_observer: bool = False
    ) -> tuple[int, int]:
        """Choose (slot_block, chunk_spp) so a wave is <= max_rays_per_batch
        rays. Favor whole-image blocks (better for progressive preview);
        split samples first, pixels only when one-sample whole-image waves are
        still too large."""
        num_pixels = total_slots
        if self.backend == "pallas":
            # The regen megakernel owns whole pixel slots (one pixel per
            # slot, all chunk samples traced in-kernel), so the only split
            # axis is spp; one dispatch always covers every slot (padded so
            # slots divide evenly over the px mesh axis). The chunk bound
            # exists purely for progress-callback granularity.
            quantum = DEFAULT_TILE_RAYS * (
                self.mesh.shape["px"] if self.mesh is not None else 1
            )
            block = -(-total_slots // quantum) * quantum
            # Baseline chunk: bounded rays per wave (progress granularity).
            # Without a progress observer, never split a large spp budget
            # into more than ~4 waves: within a kernel program the wave
            # ends when ALL lanes finish their chunk, so small chunks pay
            # the straggler-lane tail (long paths at high max_depth) once
            # per chunk. Measured on the cover scene at depth 50: 128-spp
            # chunks are 1.87x the throughput of 32-spp chunks (41 -> 77
            # Mrays/s). WITH an observer, preview/checkpoint granularity
            # wins: keep the rays-per-wave bound only.
            chunk_spp = max(
                1,
                min(spp, (self.max_rays_per_batch * 64) // max(block, 1)),
            )
            if not has_observer:
                chunk_spp = max(chunk_spp, -(-spp // 4))
            return block, chunk_spp
        # With a mesh, pixel blocks must divide evenly over the px axis.
        px_quantum = self.mesh.shape["px"] if self.mesh is not None else 1
        if num_pixels <= self.max_rays_per_batch:
            chunk_spp = max(1, min(spp, self.max_rays_per_batch // num_pixels))
            block = -(-num_pixels // px_quantum) * px_quantum
            return block, chunk_spp
        block = (self.max_rays_per_batch // px_quantum) * px_quantum
        return max(block, px_quantum), 1

    def render(
        self,
        spp: int | None = None,
        max_depth: int | None = None,
        *,
        on_progress: ProgressCallback | None = None,
        progress_every_chunks: int = 1,
        resume: bool = False,
        as_device_array: bool = False,
    ) -> np.ndarray:
        """Render the full image; returns ``uint8[H, W, 3]``.

        The (samples x pixels) workload is traced wave by wave; between waves
        the optional ``on_progress`` callback observes counters and may pull a
        preview image -- the capability analog of the reference's live SSBO
        display + progress bars (``main.cc:378-402``,
        ``ray.tracer.image.display.cc``).

        With ``resume=True`` (after a previous render or
        ``load_checkpoint``), already-accumulated samples are kept and only
        the remaining ``spp - samples_done`` are traced -- the sample sums
        are linear, so the converged mean is identical to an uninterrupted
        render with the same seed (a capability the reference lacks,
        SURVEY.md section 5.4).

        With ``as_device_array=True`` the converged uint8 image is returned
        as a DEVICE array without waiting for the transfer (dispatch is
        async); convert it later with ``fetch_image``. This lets an
        interactive caller overlap the next frame's compute with the
        previous frame's readback (examples/orbit_demo.py).
        """
        spp = int(spp if spp is not None else self.params.samples_per_pixel)
        max_depth = int(max_depth if max_depth is not None else self.params.max_depth)
        self._spp_target = spp

        if spp <= 0:
            # Zero samples: nothing to trace; the converged mean of an empty
            # sample set is defined as black.
            self._start_time = time.perf_counter()
            self._end_time = self._start_time
            self._samples_done = 0
            return np.zeros((self.camera.image_height, self.camera.image_width, 3), np.uint8)

        cam = self.camera
        num_pixels = self.pixels_count

        # Work-slot order: 2D 32x32 pixel tiles for the pallas backend
        # (coherent camera rays per kernel program); plain raster order
        # otherwise. Out-of-image/padding slots carry the spill id.
        if self.backend == "pallas":
            all_ids = rtiling.tiled_pixel_ids(cam.image_width, cam.image_height)
            pixel_order = "tiled"
        else:
            all_ids = np.arange(num_pixels, dtype=np.int32)
            pixel_order = "linear"
        total_slots = len(all_ids)
        pixel_block, chunk_spp = self._plan(
            spp, total_slots, has_observer=on_progress is not None
        )
        # Adaptive wave sizing (pallas only; chunk size is a runtime loop
        # bound there, not a memory knob): big waves amortize the
        # straggler-lane tail (measured 41 -> 77 Mrays/s on the cover scene
        # at depth 50 going from 32- to 128-spp waves), but per-wave wall
        # clock is unknown a priori -- scene cost spans ~100x -- and one
        # overlong dispatch can trip the remote runtime's watchdog
        # (measured: a ~140 s wave crashed the TPU worker). So: start with
        # a small probe wave, time every wave synchronously, and size the
        # next to ~_WAVE_TARGET_S. A progress observer additionally caps
        # waves at the planner's chunk (callback granularity).
        adaptive = self.backend == "pallas"
        # Small budgets render in one status-quo wave; larger ones start
        # with an 8-spp probe so the first measurement is cheap even on
        # expensive scenes -- unless a previous render of this instance
        # already measured the wave rate, in which case the first wave is
        # sized to the target directly (repeat renders skip the probe).
        if adaptive and spp > 32:
            if self._wave_rate is None:
                wave_spp = min(chunk_spp, 8)
            else:
                wave_spp = max(8, int(self._wave_rate * _WAVE_TARGET_S))
                if on_progress is not None:
                    wave_spp = min(wave_spp, chunk_spp)
        else:
            wave_spp = chunk_spp

        slot_mode = self.backend == "pallas"
        pad = (-total_slots) % pixel_block
        if pad:
            all_ids = np.concatenate(
                [all_ids, np.full(pad, num_pixels, np.int32)]
            )
        slot_bases = list(range(0, len(all_ids), pixel_block))
        if slot_mode:
            # The fused kernel accumulates in slot order; the id table stays
            # on the host for the final reorder (no device scatter at all).
            id_blocks = [None] * len(slot_bases)
        else:
            id_blocks = [
                jnp.asarray(all_ids[i : i + pixel_block]) for i in slot_bases
            ]

        def snapshot_u8(image_sum, inv):
            if slot_mode:
                return _slots_to_u8(image_sum, inv)
            return _to_u8(image_sum, inv, cam.image_height, cam.image_width)

        def to_host_image(u8_dev):
            arr = np.asarray(jax.device_get(u8_dev))
            if slot_mode:
                return _slots_to_image(
                    arr, all_ids, num_pixels, cam.image_height,
                    cam.image_width,
                )
            return arr

        # Work-ahead regen (pallas, sharded or not): per-slot done counts are
        # carried across waves so lanes that finish a wave's target early
        # keep tracing their own slot's samples -- only the FINAL wave pays
        # the within-tile straggler tail (see trace._regen_kernel; the
        # sharded layout is shard.render_pixels_fused_sharded's).
        # RT_WORK_AHEAD=0 restores self-contained waves (A/B knob).
        work_ahead = slot_mode
        if work_ahead:
            from ..ops.pallas.trace import _knob

            work_ahead = _knob("RT_WORK_AHEAD", "1") != "0"
        done_dev: jnp.ndarray | None = None
        done_rows = pixel_block // 128

        resuming = (
            resume and self._image_sum is not None and self._samples_done > 0
        )
        if resuming:
            # Keep accumulated sums; trace only the remaining samples.
            image_sum = self._image_sum
            sample_start = self._samples_done
            tiles_so_far = self._tiles_counter
            if work_ahead:
                done_dev = self._done
                if done_dev is None:
                    # Pre-work-ahead state (or an old checkpoint): the
                    # completed set is exactly the prefix [0, sample_start)
                    # (true for every self-contained decomposition).
                    done_dev = jnp.asarray(
                        self._prefix_done_np(done_rows, sample_start, spp)
                    )
                    self._done_budget = spp
            if sample_start >= spp:
                # Work-ahead slots can hold MORE than sample_start samples
                # (a mid-render checkpoint resumed toward a smaller target)
                # -- normalize per slot in that case. Per-slot TOTALS are
                # split-independent, so this is valid whatever budget laid
                # the done blocks out.
                if done_dev is not None:
                    inv = 1.0 / jnp.maximum(
                        self._per_slot_done(done_dev), 1
                    ).astype(jnp.float32)
                else:
                    inv = 1.0 / sample_start
                return to_host_image(snapshot_u8(image_sum, inv))
            if (
                work_ahead
                and self._done is not None
                and self._work_ahead_shards() > 1
                and self._done_budget != spp
            ):
                # The sharded done layout depends on the budget split. A
                # state at a wave boundary (e.g. a COMPLETED previous
                # render) is the prefix [0, sample_start) in any split --
                # rebuild it under the new one; a ragged mid-work-ahead
                # state cannot be re-split.
                arr = np.asarray(jax.device_get(done_dev))
                old = (
                    None
                    if self._done_budget is None
                    else self._prefix_done_np(
                        done_rows, sample_start, int(self._done_budget)
                    )
                )
                if old is None or not np.array_equal(arr, old):
                    raise ValueError(
                        "cannot resume a mid-render sharded work-ahead "
                        f"state toward a different spp (state split at "
                        f"{self._done_budget}, target {spp}); finish the "
                        "render at the original spp first"
                    )
                done_dev = jnp.asarray(
                    self._prefix_done_np(done_rows, sample_start, spp)
                )
                self._done_budget = spp
        else:
            if slot_mode:
                image_sum = jnp.zeros((len(all_ids), 3), jnp.float32)
            else:
                # Pixel-order framebuffer with one spill row for padded ids.
                image_sum = jnp.zeros((num_pixels + 1, 3), jnp.float32)
            sample_start = 0
            tiles_so_far = 0
            self._segments = 0
            self._elapsed_base = 0.0
            if work_ahead:
                done_dev = jnp.zeros(
                    (self._work_ahead_shards() * done_rows, 128), jnp.int32
                )
                self._done_budget = spp

        self._samples_done = sample_start
        self._start_time = time.perf_counter()
        self._end_time = None

        seg_handles: list[jnp.ndarray] = []
        chunk_index = 0
        pallas_seed = jnp.int32(self.seed & 0x7FFFFFFF)
        if self.backend == "pallas":
            map_param = jnp.int32(rtiling.tiles_per_row(cam.image_width))
        while sample_start < spp:
            this_chunk = min(wave_spp, spp - sample_start)
            if adaptive:
                t_wave0 = time.perf_counter()
            for ids, sbase in zip(id_blocks, slot_bases):
                if self.backend == "pallas" and work_ahead:
                    # Work-ahead wave: the kernel gets the FULL budget
                    # (spp) as its cap, this wave's cumulative target, and
                    # the carried per-slot done counts. RNG ids are
                    # sample_start-free here: done is absolute.
                    image_sum, segments, done_dev = _accumulate_step_pallas(
                        image_sum,
                        self.scene,
                        cam,
                        map_param,
                        jnp.int32(sbase),
                        pallas_seed,
                        jnp.int32(0),
                        jnp.int32(spp),
                        jnp.int32(max_depth),
                        pixel_block,
                        pixel_order,
                        self.mesh,
                        self._pallas_interpret,
                        done=done_dev,
                        t_end=jnp.int32(sample_start + this_chunk),
                    )
                    n_sp = (
                        self.mesh.shape["spp"] if self.mesh is not None else 1
                    )
                    tiles_so_far += (pixel_block // DEFAULT_TILE_RAYS) * n_sp
                elif self.backend == "pallas":
                    image_sum, segments = _accumulate_step_pallas(
                        image_sum,
                        self.scene,
                        cam,
                        map_param,
                        jnp.int32(sbase),
                        pallas_seed,
                        jnp.int32(sample_start),
                        jnp.int32(this_chunk),
                        jnp.int32(max_depth),
                        pixel_block,
                        pixel_order,
                        self.mesh,
                        self._pallas_interpret,
                    )
                    n_sp = (
                        self.mesh.shape["spp"] if self.mesh is not None else 1
                    )
                    tiles_so_far += (pixel_block // DEFAULT_TILE_RAYS) * n_sp
                else:
                    image_sum, segments = _accumulate_step(
                        image_sum,
                        self.scene,
                        cam,
                        self.base_key,
                        ids,
                        jnp.int32(sample_start),
                        this_chunk,
                        spp,
                        max_depth,
                        self.use_matmul,
                        self.mesh,
                        self.backend,
                        pallas_seed,
                        pixel_order,
                        jnp.int32(sbase),
                    )
                    tiles_so_far += (
                        len(ids) * this_chunk
                    ) // DEFAULT_TILE_RAYS
                seg_handles.append(segments)
            sample_start += this_chunk
            self._samples_done = sample_start
            # Keep live references so Ctrl-C/checkpointing mid-render can
            # persist the latest completed chunk.
            self._image_sum = image_sum
            self._done = done_dev
            self._tiles_counter = tiles_so_far
            chunk_index += 1

            if adaptive and sample_start < spp:
                # Sync on the wave's segment scalars (forces completion),
                # then size the next wave from the measured rate.
                self._segments += int(sum(int(s) for s in seg_handles))
                seg_handles.clear()
                wave_wall = time.perf_counter() - t_wave0
                rate = this_chunk / max(wave_wall, 1e-3)
                self._wave_rate = rate
                wave_spp = max(this_chunk, int(rate * _WAVE_TARGET_S))
                if on_progress is not None:
                    wave_spp = min(wave_spp, chunk_spp)

            if on_progress is not None and (
                chunk_index % progress_every_chunks == 0 or sample_start >= spp
            ):
                # Sync segment counters lazily (they are tiny scalars).
                self._segments += int(sum(int(s) for s in seg_handles))
                seg_handles.clear()
                done = sample_start
                # Convert the snapshot to u8 NOW (cheap, on device, and safe
                # against buffer donation by later steps); fetching to host is
                # deferred until .preview() is actually called. Work-ahead
                # slots carry MORE than `done` samples -- normalize per slot.
                if work_ahead and sample_start < spp:
                    inv = 1.0 / jnp.maximum(
                        self._per_slot_done(done_dev), 1
                    ).astype(jnp.float32)
                else:
                    inv = 1.0 / done
                snap = snapshot_u8(image_sum, inv)
                on_progress(
                    RenderProgress(
                        samples_done=done,
                        samples_total=spp,
                        pixels_count=num_pixels,
                        segments_traced=self._segments,
                        elapsed_s=self.render_time(),
                        _preview=lambda s=snap: to_host_image(s),
                    )
                )

        if work_ahead:
            # Normally every slot lands on exactly spp samples (the final
            # wave's cap); per-slot counts also stay exact if a work-ahead
            # checkpoint is resumed toward a smaller target.
            image_u8_dev = snapshot_u8(
                image_sum,
                1.0 / jnp.maximum(
                    self._per_slot_done(done_dev), 1
                ).astype(jnp.float32),
            )
        else:
            image_u8_dev = snapshot_u8(image_sum, 1.0 / spp)
        image_np = None if as_device_array else to_host_image(image_u8_dev)
        self._segments += int(sum(int(s) for s in seg_handles))
        self._end_time = time.perf_counter()
        self._elapsed_base = self.render_time()
        self._start_time = None
        self._end_time = None
        self._image_sum = image_sum
        self._tiles_counter = tiles_so_far
        self._slot_ids = all_ids if slot_mode else None
        if as_device_array:
            return image_u8_dev
        return image_np

    def _frame_setup(self, spp, max_depth, what: str):
        """Shared render_frame/render_frame_preview prologue: validate,
        resolve (spp, max_depth), and refresh the per-resolution slot-id
        cache. The slot table is CONSTANT for a camera resolution, so it
        is built (and uploaded, for the preview step) once per (W, H)
        instead of per frame -- a per-frame jnp.asarray upload is ~1.6 MB
        at 800x470, exactly the payload class whose concurrent transfer
        collapses the tunnel's dispatch pipeline (CLAUDE.md)."""
        if self.backend != "pallas":
            raise ValueError(f"{what} requires the pallas backend")
        if self.mesh is not None:
            raise ValueError(
                f"{what} is single-chip (it bypasses the mesh); use "
                "render() for sharded rendering"
            )
        spp = int(spp if spp is not None else self.params.samples_per_pixel)
        max_depth = int(
            max_depth if max_depth is not None else self.params.max_depth
        )
        cam = self.camera
        wh = (cam.image_width, cam.image_height)
        if getattr(self, "_frame_ids_wh", None) != wh:
            self._frame_ids_wh = wh
            self._frame_ids_host = rtiling.tiled_pixel_ids(*wh)
            self._frame_ids_dev = jnp.asarray(
                self._frame_ids_host, jnp.int32
            )
        self._slot_ids = self._frame_ids_host
        return spp, max_depth, cam

    def _frame_finish(self, slots: int, spp: int, segments):
        self._frame_sample_base += spp
        self._tiles_counter += slots // DEFAULT_TILE_RAYS
        # Device scalar; folded into segments_traced lazily (no sync here,
        # the interactive path must not block the dispatch pipeline).
        self._pending_segments.append(segments)

    def render_frame(self, spp: int | None = None, max_depth: int | None = None):
        """Interactive path: one fused dispatch per frame, returning the
        DEVICE u8 image (slot order) without sync -- pair with
        ``fetch_image``. Uses the pallas backend's tiled slot order; advances
        the absolute sample base so consecutive frames draw fresh samples."""
        spp, max_depth, cam = self._frame_setup(spp, max_depth, "render_frame")
        slots = rtiling.num_slots(cam.image_width, cam.image_height)
        dev, segments = _frame_step(
            self.scene,
            cam,
            jnp.int32(rtiling.tiles_per_row(cam.image_width)),
            jnp.int32(self.seed & 0x7FFFFFFF),
            jnp.int32(self._frame_sample_base),
            jnp.int32(spp),
            jnp.int32(max_depth),
            slots,
            "tiled",
            self._pallas_interpret,
        )
        self._frame_finish(slots, spp, segments)
        return dev

    def render_frame_preview(
        self,
        spp: int | None = None,
        max_depth: int | None = None,
        preview_cols: int = 240,
        preview_rows: int = 136,
    ):
        """``render_frame`` variant that also returns a small DEVICE-side
        downsampled preview: ``(dev_slots, dev_preview)``. Fetch the tiny
        preview per frame for a live display (tens of KB overlaps the next
        dispatch safely on the remote tunnel; a full-frame fetch does not
        -- see _frame_preview_step); fetch the full slots only for frames
        being recorded. The preview covers the WHOLE frame; its actual
        shape is ceil(H/fy) x ceil(W/fx) <= (preview_rows, preview_cols)
        where fy/fx are the ceil box factors."""
        spp, max_depth, cam = self._frame_setup(
            spp, max_depth, "render_frame_preview"
        )
        slots = rtiling.num_slots(cam.image_width, cam.image_height)
        h, w = cam.image_height, cam.image_width
        ph = min(int(preview_rows), h)
        pw = min(int(preview_cols), w)
        fy = -(-h // ph)
        fx = -(-w // pw)
        dev, prev, segments = _frame_preview_step(
            self.scene,
            cam,
            jnp.int32(rtiling.tiles_per_row(cam.image_width)),
            jnp.int32(self.seed & 0x7FFFFFFF),
            jnp.int32(self._frame_sample_base),
            jnp.int32(spp),
            jnp.int32(max_depth),
            self._frame_ids_dev,
            slots,
            "tiled",
            h,
            w,
            -(-h // fy),
            -(-w // fx),
            self._pallas_interpret,
        )
        self._frame_finish(slots, spp, segments)
        return dev, prev

    # -- converge-while-interactive (the reference's defining UX: the live
    # window refines toward the full-spp render while idle, main.cc:733-774,
    # ray.tracer.image.display.cc:108-117) --------------------------------
    @property
    def frame_accum_samples(self) -> int:
        """Samples accumulated at the current camera pose."""
        return self._frame_accum_count

    def frame_accum_reset(self) -> None:
        """Start a fresh accumulation (call when the camera moves). Costs
        nothing on device: the next accum frame overwrites instead of
        adding (static ``fresh`` branch)."""
        self._frame_accum_count = 0

    def render_frame_accum(
        self, spp: int | None = None, max_depth: int | None = None
    ):
        """Accumulating interactive frame: trace ``spp`` FRESH samples
        (absolute ids ``[count, count+spp)`` -- the identical sample set a
        one-shot ``render(spp=count+spp)`` with this seed draws) and return
        ``(dev_u8, total)`` where ``dev_u8`` is the accumulated-mean image
        (slot order, no sync; pair with ``fetch_image``) and ``total`` the
        per-pose sample count after this frame. Present it and the idle
        camera visibly converges; call ``frame_accum_reset()`` on motion."""
        spp, max_depth, cam = self._frame_setup(
            spp, max_depth, "render_frame_accum"
        )
        slots = rtiling.num_slots(cam.image_width, cam.image_height)
        fresh = self._frame_accum_count == 0
        total = self._frame_accum_count + spp
        self._frame_accum_sum, dev, segments = _frame_accum_step(
            self._accum_buffer(slots, fresh),
            self.scene,
            cam,
            jnp.int32(rtiling.tiles_per_row(cam.image_width)),
            jnp.int32(self.seed & 0x7FFFFFFF),
            jnp.int32(self._frame_accum_count),
            jnp.int32(spp),
            jnp.int32(max_depth),
            jnp.int32(total),
            slots,
            "tiled",
            fresh,
            self._pallas_interpret,
        )
        self._frame_accum_count = total
        self._accum_finish(slots, segments)
        return dev, total

    def render_frame_accum_preview(
        self,
        spp: int | None = None,
        max_depth: int | None = None,
        preview_cols: int = 240,
        preview_rows: int = 136,
    ):
        """``render_frame_accum`` variant returning ``(dev_u8, dev_preview,
        total)`` with the device-side downsampled preview (per-frame fetch
        stays tens of KB at any frame size -- see
        ``render_frame_preview``)."""
        spp, max_depth, cam = self._frame_setup(
            spp, max_depth, "render_frame_accum_preview"
        )
        slots = rtiling.num_slots(cam.image_width, cam.image_height)
        h, w = cam.image_height, cam.image_width
        ph = min(int(preview_rows), h)
        pw = min(int(preview_cols), w)
        fy = -(-h // ph)
        fx = -(-w // pw)
        fresh = self._frame_accum_count == 0
        total = self._frame_accum_count + spp
        self._frame_accum_sum, dev, prev, segments = (
            _frame_accum_preview_step(
                self._accum_buffer(slots, fresh),
                self.scene,
                cam,
                jnp.int32(rtiling.tiles_per_row(cam.image_width)),
                jnp.int32(self.seed & 0x7FFFFFFF),
                jnp.int32(self._frame_accum_count),
                jnp.int32(spp),
                jnp.int32(max_depth),
                jnp.int32(total),
                self._frame_ids_dev,
                slots,
                "tiled",
                fresh,
                h,
                w,
                -(-h // fy),
                -(-w // fx),
                self._pallas_interpret,
            )
        )
        self._frame_accum_count = total
        self._accum_finish(slots, segments)
        return dev, prev, total

    def _accum_buffer(self, slots: int, fresh: bool) -> jnp.ndarray:
        """The accumulation buffer to feed the fused step: a (1, 3) dummy
        when ``fresh`` (its values are ignored under the static branch --
        no zeroing dispatch), else the carried per-pose sums."""
        if fresh:
            # Cached dummy: a fresh jnp.zeros per motion frame would pay a
            # host->device upload round trip EVERY frame on the remote
            # tunnel (~0.05-0.1 s -- the orbit-phase fps limiter).
            dummy = getattr(self, "_accum_dummy", None)
            if dummy is None:
                dummy = self._accum_dummy = jnp.zeros((1, 3), jnp.float32)
            return dummy
        assert self._frame_accum_sum is not None  # count > 0 implies a sum
        if self._frame_accum_sum.shape[0] != slots:
            raise ValueError(
                "frame accumulation buffer does not match the current "
                "resolution; call frame_accum_reset() after resizing"
            )
        return self._frame_accum_sum

    def _accum_finish(self, slots: int, segments) -> None:
        self._tiles_counter += slots // DEFAULT_TILE_RAYS
        self._pending_segments.append(segments)

    def fetch_image(self, u8_dev) -> np.ndarray:
        """Device u8 array from ``render(as_device_array=True)`` -> host
        ``uint8[H, W, 3]`` (slot->pixel reorder included)."""
        arr = np.asarray(jax.device_get(u8_dev))
        if arr.ndim == 2:  # slot order
            return _slots_to_image(
                arr, self._slot_ids, self.pixels_count,
                self.camera.image_height, self.camera.image_width,
            )
        return arr

    # -- checkpoint / resume (SURVEY.md section 5.4: absent in the reference;
    # the accumulated sample sums make it trivial here) ----------------------
    def _fingerprint(self) -> str:
        import hashlib

        h = hashlib.sha1()
        for arr in (
            self.scene.centers, self.scene.radii, self.scene.albedo,
            self.scene.fuzz, self.scene.ior, self.scene.mat_kind,
        ):
            h.update(np.asarray(arr).tobytes())
        # samples_per_pixel is deliberately excluded: it is the render-time
        # budget being resumed. max_depth stays in -- sums of different-depth
        # samples would be a silently wrong mixture.
        p = dataclasses.replace(self.params, samples_per_pixel=0)
        h.update(repr(p).encode())
        h.update(str(self.seed).encode())
        return h.hexdigest()

    def _framebuffer_rows(self) -> int:
        """Rows of the accumulation buffer for this backend/mesh (slot
        order padded to the mesh quantum for pallas; pixels + spill row for
        xla)."""
        if self.backend == "pallas":
            slots = rtiling.num_slots(
                self.camera.image_width, self.camera.image_height
            )
            quantum = DEFAULT_TILE_RAYS * (
                self.mesh.shape["px"] if self.mesh is not None else 1
            )
            return -(-slots // quantum) * quantum
        return self.pixels_count + 1

    def save_checkpoint(self, path: str) -> None:
        """Persist the accumulated radiance sums + counters to ``path``
        (``.npz`` appended if missing, mirroring ``np.savez``)."""
        if self._image_sum is None:
            raise ValueError("nothing rendered yet; no state to checkpoint")
        if not str(path).endswith(".npz"):
            path = f"{path}.npz"
        extra = {}
        if self._done is not None:
            # Work-ahead regen: slots may carry MORE than samples_done
            # samples (their sums are already in image_sum). Without this
            # array a resume would re-trace and double count them.
            extra["done"] = np.asarray(jax.device_get(self._done))
            if self._done_budget is not None:
                # Sharded done blocks are laid out by the budget split
                # (shard.render_pixels_fused_sharded); a resume toward a
                # different spp needs this to validate/re-split them.
                extra["done_budget"] = self._done_budget
        np.savez_compressed(
            path,
            image_sum=np.asarray(jax.device_get(self._image_sum)),
            samples_done=self._samples_done,
            segments=self._segments,
            tiles_counter=self._tiles_counter,
            elapsed=self._elapsed_base,
            fingerprint=self._fingerprint(),
            # Framebuffer layout: the pallas backend accumulates in kernel
            # slot order, the xla backend in pixel order (+ spill row).
            layout="slot" if self.backend == "pallas" else "pixel",
            **extra,
        )

    def load_checkpoint(self, path: str) -> int:
        """Restore accumulated state; returns samples already done.

        The checkpoint must have been produced by a renderer with the same
        scene, camera and seed (fingerprint-checked). Both backends key
        their RNG by (pixel, absolute sample id) -- xla via threefry,
        pallas via the kernel's counter hash -- so resumed sampling draws
        exactly the samples an uninterrupted render would have drawn. The
        final image is bit-equal when the resumed chunk decomposition
        matches the uninterrupted one (true for the default plan at the
        same target spp); a different chunking regroups the f32 sample
        additions and can differ in the last ulp only.
        """
        if not str(path).endswith(".npz"):
            path = f"{path}.npz"
        data = np.load(path, allow_pickle=False)
        if str(data["fingerprint"]) != self._fingerprint():
            raise ValueError(
                "checkpoint fingerprint mismatch (different scene, camera, "
                "or seed)"
            )
        layout = str(data["layout"]) if "layout" in data else "pixel"
        expected = "slot" if self.backend == "pallas" else "pixel"
        if layout != expected:
            raise ValueError(
                f"checkpoint framebuffer layout {layout!r} does not match "
                f"the {self.backend!r} backend's {expected!r} layout; resume "
                "with the backend that produced the checkpoint"
            )
        rows = int(data["image_sum"].shape[0])
        want_rows = self._framebuffer_rows()
        if rows != want_rows:
            raise ValueError(
                f"checkpoint framebuffer has {rows} rows but this renderer "
                f"expects {want_rows} (different mesh px-axis or image "
                "padding); resume with the mesh that produced the checkpoint"
            )
        self._image_sum = jnp.asarray(data["image_sum"])
        # Per-slot work-ahead counts (absent in pre-work-ahead checkpoints,
        # where every slot sits exactly at the samples_done boundary --
        # render(resume=True) reconstructs that case from samples_done).
        if "done" in data:
            want_done = self._work_ahead_shards() * (want_rows // 128)
            if int(data["done"].shape[0]) != want_done:
                raise ValueError(
                    f"checkpoint done array has {data['done'].shape[0]} rows "
                    f"but this renderer's mesh expects {want_done}; resume "
                    "with the mesh that produced the checkpoint"
                )
            self._done = jnp.asarray(data["done"])
            self._done_budget = (
                int(data["done_budget"]) if "done_budget" in data else None
            )
        else:
            self._done = None
            self._done_budget = None
        self._samples_done = int(data["samples_done"])
        self._segments = int(data["segments"])
        self._tiles_counter = int(data["tiles_counter"])
        self._elapsed_base = float(data["elapsed"])
        self._start_time = None
        self._end_time = None
        return self._samples_done

    def mrays_per_sec(self) -> float:
        t = self.render_time()
        return (self.segments_traced / t) / 1.0e6 if t > 0 else 0.0

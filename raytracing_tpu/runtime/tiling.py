"""2D pixel-tile work order: the TPU-native analog of the reference's 8x8
image tiles (``/root/reference/src/main.cc:615-629``).

The reference decomposes the image into 8x8 pixel tiles for cache locality
and shuffles them for load balance. Here tiles serve a different master:
RAY COHERENCE. A kernel wave of 1024 consecutive work slots maps to one
32x32 pixel tile, so the rays of one Pallas program point into a narrow
frustum -- the precondition for any future group-coherent culling or ray
binning (a per-block bounding-sphere cull was measured and rejected as
neutral; see CLAUDE.md kernel perf log). No shuffling is needed -- waves
are statically balanced.

The slot -> pixel mapping must be computed identically on the host (to build
the scatter-add id table) and inside the kernel (to generate camera rays), so
both implementations live next to each other and are cross-checked in
tests/test_pallas.py (host/kernel map cross-check):

  tile   = slot // (TILE_W*TILE_H)
  within = slot %  (TILE_W*TILE_H)
  wy, wx = divmod(within, TILE_W)
  ty, tx = divmod(tile, tiles_per_row)
  px, py = tx*TILE_W + wx, ty*TILE_H + wy

Slots whose (px, py) fall outside the image map to the spill id
``width*height`` (discarded by the renderer's spill framebuffer row). The
kernel maps slots with integer bit arithmetic plus one small f32 division by
tiles-per-row: exact up to 2^23 TILES (8.5G slots).
"""

from __future__ import annotations

import numpy as np

TILE_W = 32
TILE_H = 32
SLOTS_PER_TILE = TILE_W * TILE_H  # == one pallas kernel tile at 1 sample/slot


def tiles_per_row(width: int) -> int:
    return -(-width // TILE_W)


def num_slots(width: int, height: int) -> int:
    return tiles_per_row(width) * (-(-height // TILE_H)) * SLOTS_PER_TILE


def tiled_pixel_ids(width: int, height: int) -> np.ndarray:
    """Slot -> flat pixel id table (int32), spill id = width*height."""
    tpr = tiles_per_row(width)
    slots = num_slots(width, height)
    slot = np.arange(slots, dtype=np.int64)
    tile, within = np.divmod(slot, SLOTS_PER_TILE)
    wy, wx = np.divmod(within, TILE_W)
    ty, tx = np.divmod(tile, tpr)
    px = tx * TILE_W + wx
    py = ty * TILE_H + wy
    valid = (px < width) & (py < height)
    ids = np.where(valid, py * width + px, width * height)
    return ids.astype(np.int32)

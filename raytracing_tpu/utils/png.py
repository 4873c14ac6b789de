"""Minimal dependency-free PNG writer (zlib + struct).

The reference vendors ``stb_image_write.h`` but never wires it up
(``/root/reference/src/renderer.common.cc:285-304`` is commented out;
SURVEY.md section 5.4) -- the rendered image is never persisted. This module
closes that capability gap: 8-bit RGB/RGBA/grayscale PNG encoding for final
images and progressive snapshots. A faster native encoder can be slotted in
via ``raytracing_tpu.runtime.native`` when built.
"""

from __future__ import annotations

import pathlib
import struct
import zlib

import numpy as np

_COLOR_TYPES = {1: 0, 3: 2, 4: 6}  # channels -> PNG color type


def encode_png(image: np.ndarray, *, compress_level: int = 6) -> bytes:
    """Encode ``uint8[H, W, C]`` (C in {1, 3, 4}) as a PNG byte string."""
    image = np.asarray(image)
    if image.dtype != np.uint8:
        raise TypeError(f"expected uint8 image, got {image.dtype}")
    if image.ndim == 2:
        image = image[..., None]
    if image.ndim != 3 or image.shape[-1] not in _COLOR_TYPES:
        raise ValueError(f"expected [H, W, {{1,3,4}}] image, got shape {image.shape}")

    height, width, channels = image.shape
    color_type = _COLOR_TYPES[channels]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        out = struct.pack(">I", len(payload)) + tag + payload
        crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
        return out + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    # Filter byte 0 (None) per scanline.
    raw = np.concatenate(
        [np.zeros((height, 1), np.uint8), image.reshape(height, -1)], axis=1
    ).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, compress_level))
        + chunk(b"IEND", b"")
    )


def write_png(path: str | pathlib.Path, image: np.ndarray, *, compress_level: int = 6) -> None:
    pathlib.Path(path).write_bytes(encode_png(image, compress_level=compress_level))


def read_png(path: str | pathlib.Path) -> np.ndarray:
    """Decode the subset of PNG this module writes (8-bit, non-interlaced,
    filter 0) -- sufficient for round-tripping golden images in tests."""
    data = pathlib.Path(path).read_bytes()
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG file")
    pos = 8
    width = height = channels = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace != 0:
                raise ValueError("unsupported PNG variant")
            channels = {0: 1, 2: 3, 6: 4}[color_type]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    stride = width * channels + 1
    rows = raw.reshape(height, stride)
    if np.any(rows[:, 0] != 0):
        raise ValueError("unsupported PNG filter (writer uses filter 0 only)")
    return rows[:, 1:].reshape(height, width, channels)

"""ctypes bridge to the optional C++ runtime helpers (``native/``).

The reference's runtime around the tracer core is native C++ -- worker
threads, a mutexed work queue, ZeroMQ message plumbing, arena allocators and
a GL display path (SURVEY.md sections 2D, 2F, 2G, 2K). The TPU build keeps
device compute in XLA/Pallas, and provides native equivalents for the
host-side runtime in ``native/librtnative.so`` (built with ``make -C
native``):

  * PNG encode (+ zlib deflate) -- the stb_image_write capability the
    reference vendors but never wires up (SURVEY.md section 2M).
  * ANSI half-block frame composition for the live terminal display -- the
    per-frame pixel->presentation hot loop (display-path analog).
  * An async frame pump (worker thread + bounded queue) so encoding/IO
    overlap device compute -- the worker/channel runtime analog.

Everything degrades gracefully: if the library is absent the Python
implementations are used and ``available()`` returns False.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_NAME = "librtnative.so"
_lib: ctypes.CDLL | None = None
_load_attempted = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    return os.path.join(root, "native", _LIB_NAME)


def _load() -> ctypes.CDLL | None:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    path = os.environ.get("RT_NATIVE_LIB", _lib_path())
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.rt_compose_halfblock.restype = ctypes.c_longlong
        lib.rt_compose_halfblock.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_longlong,
        ]
        lib.rt_png_encode.restype = ctypes.c_longlong
        lib.rt_png_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_longlong,
        ]
        lib.rt_pump_create.restype = ctypes.c_void_p
        lib.rt_pump_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.rt_pump_submit.restype = ctypes.c_int
        lib.rt_pump_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.rt_pump_destroy.restype = ctypes.c_int
        lib.rt_pump_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def compose_halfblock(img: np.ndarray) -> str:
    """uint8[H, W, 3] -> ANSI half-block frame string (C++ composer)."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    # Worst case ~40 bytes/cell + newlines.
    cap = (h // 2 + 1) * (w + 1) * 44 + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.rt_compose_halfblock(
        img.ctypes.data_as(ctypes.c_void_p), w, h, buf, cap
    )
    if n < 0:
        raise RuntimeError("rt_compose_halfblock: buffer too small")
    return buf.raw[:n].decode("utf-8")


def png_encode(img: np.ndarray) -> bytes:
    """uint8[H, W, 3] -> PNG bytes (C++ encoder)."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    cap = w * h * 3 + (h * 6) + 1024
    buf = ctypes.create_string_buffer(cap)
    n = lib.rt_png_encode(
        img.ctypes.data_as(ctypes.c_void_p), w, h, buf, cap
    )
    if n < 0:
        raise RuntimeError("rt_png_encode: buffer too small")
    return buf.raw[:n]


class FramePump:
    """Async PNG frame writer: bounded-queue worker thread in C++.

    The runtime analog of the reference's worker/channel plumbing
    (``main.cc:404-519``): ``submit`` hands a frame off without blocking the
    render loop; the native thread encodes and writes
    ``<prefix>NNNN.png``. ``close`` drains and joins.
    """

    def __init__(self, prefix: str, queue_depth: int = 4) -> None:
        lib = _load()
        assert lib is not None
        self._lib = lib
        self._h = lib.rt_pump_create(prefix.encode(), queue_depth)
        if not self._h:
            raise RuntimeError("rt_pump_create failed")

    def submit(self, img: np.ndarray, index: int) -> bool:
        """Enqueue a frame; returns False if the queue was full (dropped)."""
        img = np.ascontiguousarray(img, dtype=np.uint8)
        h, w, _ = img.shape
        r = self._lib.rt_pump_submit(
            self._h, img.ctypes.data_as(ctypes.c_void_p), w, h, index
        )
        return r == 0

    def close(self) -> None:
        if self._h:
            self._lib.rt_pump_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

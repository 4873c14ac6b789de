"""Structured logging: the quill analog (SURVEY.md section 5.5).

The reference starts an async logging backend with a timestamped file sink and
a time/thread/source/level line pattern (``/root/reference/src/main.cc:
797-815``: ``quill::Backend::start``, file ``raytracer.log`` + start-datetime
suffix, pattern ``[time] [thread id] [file:line] LEVEL: msg``). This module
reproduces that capability on Python's stdlib logging:

  * ``setup(log_dir)`` installs a file handler whose name carries the run's
    start datetime (``raytracer_20260816_101530.log``, truncate mode) plus an
    optional concise console handler.
  * The format mirrors quill's shipped pattern: time with ms, thread id,
    source file:line, level, message.
  * Handlers use a QueueHandler/QueueListener pair so formatting + IO happen
    on a background thread -- the "async backend thread" semantics of quill
    (log calls on the render path never block on disk).

``get_logger(name)`` is the ``g_logger`` analog (``src/logging.hpp:6``).
"""

from __future__ import annotations

import atexit
import datetime
import logging
import logging.handlers
import os
import queue
import sys

_ROOT_NAME = "raytracing_tpu"
_PATTERN = (
    "[%(asctime)s.%(msecs)03d] [t:%(thread)d] [%(filename)s:%(lineno)d] "
    "%(levelname)s: %(message)s"
)
_DATEFMT = "%H:%M:%S"

_listener: logging.handlers.QueueListener | None = None


def get_logger(name: str | None = None) -> logging.Logger:
    """Module logger under the framework root (``g_logger`` analog)."""
    if name is None:
        return logging.getLogger(_ROOT_NAME)
    return logging.getLogger(f"{_ROOT_NAME}.{name}")


def setup(
    log_dir: str | None = None,
    *,
    level: int = logging.DEBUG,
    console: bool = False,
    console_level: int = logging.INFO,
) -> str | None:
    """Install the async file (+ optional console) logging backend.

    Args:
      log_dir: directory for the timestamped log file (created if missing);
        ``None`` disables the file sink (console only, if enabled).
      level: file sink level (the reference logs at Debug, ``main.cc:815``).
      console: also mirror records to stderr (present but commented out in
        the reference, ``main.cc:798`` -- opt-in here).

    Returns the log file path (or None).
    """
    global _listener
    root = logging.getLogger(_ROOT_NAME)
    root.setLevel(min(level, console_level) if console else level)
    teardown()

    handlers: list[logging.Handler] = []
    path = None
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        path = os.path.join(log_dir, f"raytracer_{stamp}.log")
        fh = logging.FileHandler(path, mode="w", encoding="utf-8")
        fh.setLevel(level)
        fh.setFormatter(logging.Formatter(_PATTERN, datefmt=_DATEFMT))
        handlers.append(fh)
    if console:
        ch = logging.StreamHandler(sys.stderr)
        ch.setLevel(console_level)
        ch.setFormatter(logging.Formatter("%(levelname)s: %(message)s"))
        handlers.append(ch)

    if handlers:
        q: queue.Queue = queue.Queue(-1)
        root.addHandler(logging.handlers.QueueHandler(q))
        _listener = logging.handlers.QueueListener(
            q, *handlers, respect_handler_level=True
        )
        _listener.start()
        atexit.register(teardown)
    return path


def teardown() -> None:
    """Stop the backend thread and detach handlers (idempotent)."""
    global _listener
    root = logging.getLogger(_ROOT_NAME)
    if _listener is not None:
        try:
            _listener.stop()
        except Exception:
            pass
        _listener = None
    for h in list(root.handlers):
        root.removeHandler(h)

"""Test configuration: force an 8-device CPU platform before JAX initializes.

Multi-device behavior (sharding over a mesh) is validated on virtual CPU
devices -- the TPU-world equivalent of the "fake backend" test pattern
(SURVEY.md section 4): ``xla_force_host_platform_device_count=8`` gives every
test run a deterministic 8-device mesh without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force, don't setdefault: the TPU harness environment pre-sets
# JAX_PLATFORMS=axon, and its sitecustomize additionally calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter startup --
# so both the env var AND the config must be pinned back to cpu here.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if _xb.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()

assert jax.device_count() == 8, (
    f"tests require the 8-device CPU platform, got {jax.devices()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _ensure_native_built() -> None:
    """Build ``native/librtnative.so`` so the native-helper tests run instead
    of skipping (the lib is a build artifact, never checked in). ``make`` is
    ALWAYS invoked (an up-to-date .so makes it a ~instant no-op) so edits to
    native/rtnative.cc are picked up by mtime instead of silently testing a
    stale library. Concurrent pytest processes serialize on an exclusive
    flock so no reader ever dlopens a partially written .so. Build failures
    emit a one-line warning and the ``needs_native`` tests skip gracefully
    as before. ``RT_NATIVE_LIB`` pointing elsewhere disables the auto-build."""
    import fcntl
    import shutil
    import subprocess
    import sys

    if os.environ.get("RT_NATIVE_LIB"):
        return
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native_dir = os.path.join(root, "native")
    if shutil.which("make") is None:
        print(
            "conftest: 'make' not found; native helpers not built "
            "(needs_native tests will skip)",
            file=sys.stderr,
        )
        return
    try:
        with open(os.path.join(native_dir, ".build.lock"), "a+") as lock:
            fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
            proc = subprocess.run(
                ["make", "-C", native_dir],
                capture_output=True,
                timeout=120,
                check=False,
            )
        if proc.returncode != 0:
            print(
                f"conftest: native auto-build failed (make exited "
                f"{proc.returncode}); needs_native tests will skip. "
                f"stderr tail: {proc.stderr.decode(errors='replace')[-300:]}",
                file=sys.stderr,
            )
    except Exception as exc:
        print(
            f"conftest: native auto-build errored ({exc!r}); "
            "needs_native tests will skip",
            file=sys.stderr,
        )


_ensure_native_built()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)

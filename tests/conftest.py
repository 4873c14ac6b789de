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
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)

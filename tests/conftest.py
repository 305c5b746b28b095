"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests validate numerics and multi-chip sharding logic without TPU hardware;
the benchmark (`bench.py`) is what runs on the real chip.  These env vars must
be set before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax (for the TPU tunnel plugin) before
# any conftest runs, so the env var alone is too late — override the already-
# loaded config as well.  Backends are initialized lazily, so this is safe as
# long as no test touched a device earlier.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "mmwave_radar_processing"))


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="upstream reference checkout not available for golden comparison",
)


@pytest.fixture(scope="session")
def flagship_cfg_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "configs", "6843_RadVel_ods_20Hz.cfg")


@pytest.fixture(scope="session")
def flagship_config(flagship_cfg_path):
    from mmwave_radar_processing_tpu.config import load_cfg

    return load_cfg(flagship_cfg_path, array_geometry="ods", array_direction="down")


@pytest.fixture()
def rng():
    # Function-scoped on purpose: a shared session generator makes every
    # test's data depend on which tests ran before it (adding a test file
    # shifted the stream and flipped a borderline RANSAC scene).  A fresh
    # seeded generator per test is deterministic and order-independent.
    return np.random.default_rng(1234)

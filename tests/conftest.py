"""Test configuration: force an 8-device virtual CPU mesh.

Must set the env vars before jax is imported anywhere, so this file keeps the
import at the very top of the test session. Sharding tests then use real
(virtual) multi-device meshes without TPU hardware.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon TPU plugin can override JAX_PLATFORMS at import time; force CPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="upstream reference checkout not available"
)

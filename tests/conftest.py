"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

Multi-chip sharding tests run on the host platform with
``xla_force_host_platform_device_count`` (SURVEY §4: no fake collectives are
needed — the pipeline is batch-parallel only).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)

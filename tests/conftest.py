"""Test configuration: force CPU with 8 simulated devices.

Multi-chip sharding paths are validated on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``); the real-TPU path is
exercised by ``bench.py`` and the driver's compile checks.

Note: the environment pre-imports jax (site hook), so ``JAX_PLATFORMS``
from ``os.environ`` is too late — ``jax.config.update`` is the reliable
switch. ``XLA_FLAGS`` still works because the CPU client initializes
lazily.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

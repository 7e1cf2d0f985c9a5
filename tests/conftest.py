"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

SPMD/sharding tests exercise real collectives without TPU hardware
(SURVEY §4: test strategy item 3).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(1234)

"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

SPMD/sharding tests exercise real collectives without TPU hardware
(SURVEY §4: test strategy item 3).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The harness pins JAX_PLATFORMS=axon (real TPU) and its sitecustomize
# re-asserts it at registration time, so the env var alone is not enough —
# override via jax.config before any backend is touched.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the oracle tier jits several full-W48 graphs
# (~13 min each on one CPU core); re-runs of an unchanged graph become
# near-instant. Keyed by HLO hash, so any model/code change recompiles.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("TPUSEG_TEST_CACHE",
                                 "/tmp/tpuseg_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(1234)


def tree_l1_rel(a, b) -> float:
    """L1-relative distance over ALL leaves of two pytrees (the CLAUDE.md
    gradient-comparison metric: per-leaf max-relative blows up on
    near-zero leaves)."""
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb), (len(la), len(lb))
    num = sum(float(np.abs(np.asarray(x, np.float64)
                           - np.asarray(y, np.float64)).sum())
              for x, y in zip(la, lb))
    den = sum(float(np.abs(np.asarray(y, np.float64)).sum()) for y in lb)
    return num / (den + 1e-12)

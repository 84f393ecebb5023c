"""Test harness: force CPU with 8 virtual devices and enable f64.

SURVEY.md §4 tier 4: multi-chip behavior is exercised in CI with
``xla_force_host_platform_device_count`` so halo exchange and sharding run
without TPU hardware.  f64 gives oracle-grade comparisons (1e-10 rel L2).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's axon TPU-tunnel plugin force-selects itself via
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start
# (sitecustomize); override back to CPU for hermetic, f64-capable tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

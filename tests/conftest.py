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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound in-process XLA/LLVM state accumulation.

    The XLA:CPU compiler intermittently SEGFAULTS late in the full suite
    (~15 min of accumulated jit executables; observed repeatedly in
    backend_compile_and_load compiling var-stencil smoother loops in the
    alphabetically-last test module, each time at a different test).
    Dropping compiled programs between modules keeps the process state
    small; per-module recompiles of shared ops cost seconds.
    """
    yield
    import jax

    jax.clear_caches()

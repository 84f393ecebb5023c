"""Pallas kernel tests vs the jnp reference ops, in interpret mode on CPU
(SURVEY.md §4 tier 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid.core import ops
from tpu_multigrid.kernels import stencil as K


def _grids(S, n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    u = np.zeros((S, S), np.float32)
    b = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    return jnp.asarray(u, dtype), jnp.asarray(b, dtype)


# Sizes exercise: multi-tile rows, full-width strips, single-window edge
# clamping, and non-(n+1) padding.
CASES = [(256, 250), (640, 632), (640, 639), (1280, 1200)]


@pytest.mark.parametrize("S,n", CASES)
@pytest.mark.parametrize("sweeps", [1, 3])
def test_pallas_jacobi_matches_ops(S, n, sweeps):
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        got = K.jacobi_sweeps(u, b, n, 2 / 3, sweeps)
    want = ops.jacobi_sweeps(u, b, n, 2 / 3, sweeps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S,n", CASES)
def test_pallas_jacobi_residual_matches_ops(S, n):
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        gu, gr = K.jacobi_sweeps_residual(u, b, n, 2 / 3, 2)
    wu = ops.jacobi_sweeps(u, b, n, 2 / 3, 2)
    wr = ops.residual(wu, b, n)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S,n", [(256, 250), (640, 632)])
@pytest.mark.parametrize("sweeps", [1, 2])
def test_pallas_rbgs_matches_ops(S, n, sweeps):
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        got = K.rbgs_sweeps(u, b, n, sweeps)
    want = ops.redblack_gs_sweeps(u, b, n, sweeps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S,n", [(256, 250), (640, 639)])
def test_pallas_residual_matches_ops(S, n):
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        got = K.residual(u, b, n)
    want = ops.residual(u, b, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_supported_gates():
    assert not K.supported(255, jnp.float32)     # not 128-multiple
    assert not K.supported(130, jnp.float32)     # too small
    assert not K.supported(8320, jnp.float64)    # unsupported dtype
    assert K.supported(8320, jnp.float32)
    assert K.supported(256, jnp.bfloat16)


def test_pallas_bf16_jacobi():
    S, n = 256, 250
    u, b = _grids(S, n, dtype=jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = K.jacobi_sweeps(u, b, n, 2 / 3, 2)
    want = ops.jacobi_sweeps(u, b, n, 2 / 3, 2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)

"""Variable-coefficient Pallas kernel tests (interpret mode) vs VarStencilOp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid.core import ops
from tpu_multigrid.core.operators import diffusion_op, galerkin_coarsen
from tpu_multigrid.kernels import varstencil as V


def _setup(S, n, seed=0):
    rng = np.random.default_rng(seed)
    u = np.zeros((S, S), np.float32)
    b = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    cells = jnp.asarray(0.5 + rng.random((n, n)), jnp.float32)
    op = diffusion_op(cells, n, S)
    return jnp.asarray(u), jnp.asarray(b), op


@pytest.mark.parametrize("S,n", [(256, 250), (640, 512), (1536, 1500)])
@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
def test_var_smooth_matches_op(S, n, smoother):
    u, b, op = _setup(S, n)
    with pltpu.force_tpu_interpret_mode():
        got = V.var_smooth(u, b, V._flat_coef(op), n, 2, smoother)
    want = op.smooth(u, b, smoother=smoother, omega=2 / 3, sweeps=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("S,n", [(256, 250), (640, 512)])
def test_var_smooth_residual_matches_op(S, n):
    u, b, op = _setup(S, n)
    with pltpu.force_tpu_interpret_mode():
        gu, gr = V.var_smooth_residual(u, b, V._flat_coef(op), n, 2)
    wu = op.smooth(u, b, smoother="jacobi", omega=2 / 3, sweeps=2)
    wr = op.residual(wu, b)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr),
                               rtol=2e-5, atol=2e-5)


def test_var_kernel_9pt_galerkin_level():
    """The kernel handles full 9-point (Galerkin-coarsened) stencils."""
    S, n = 512, 500
    rng = np.random.default_rng(3)
    cells = jnp.asarray(0.5 + rng.random((2 * n, 2 * n)), jnp.float32)
    fine = diffusion_op(cells, 2 * n, 2 * S)
    op = galerkin_coarsen(fine, S)          # 9-point coarse operator
    u = np.zeros((S, S), np.float32)
    b = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    u, b = jnp.asarray(u), jnp.asarray(b)
    with pltpu.force_tpu_interpret_mode():
        gu, gr = V.var_smooth_residual(u, b, V._flat_coef(op), n, 1)
    wu = op.smooth(u, b, smoother="jacobi", omega=2 / 3, sweeps=1)
    wr = op.residual(wu, b)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr),
                               rtol=2e-5, atol=2e-5)


def test_var_supported_gates():
    assert V.supported(4352, 4, jnp.float32)
    assert not V.supported(4352, 4, jnp.float64)
    assert not V.supported(4350, 4, jnp.float32)
    assert not V.supported(128, 4, jnp.float32)

"""Distributed Mehrstellen (order-4 compact) via the operator-general
sharded path + b0= pre-assembled RHS (VERDICT r3 next #5)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.dist.mesh import make_grid_mesh


def _forcing(x, y):
    return 2 * math.pi ** 2 * jnp.sin(math.pi * x) * jnp.sin(math.pi * y)


@pytest.mark.parametrize("mesh_shape", [(1, 1), (2, 2)])
def test_mesh_order4_matches_single_chip(mesh_shape):
    my, mx = mesh_shape
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    res = mg.solve_poisson(6, config=cfg, order=4, forcing=_forcing,
                           mesh=mesh, num_cycles=6, tol=None)
    ref = mg.solve_poisson(6, config=cfg, order=4, forcing=_forcing,
                           num_cycles=6, tol=None)
    h = np.asarray(res.res_history)
    hr = np.asarray(ref.res_history)
    # The single-chip tier evaluates the matrix-free Const9Op, the
    # distributed tier the coefficient-plane VarStencilOp — different f32
    # rounding, so agreement degrades as the residual descends toward the
    # f32 floor: tight above 1e-4 relative, loose below.
    shallow = hr / hr[0] >= 1e-4
    np.testing.assert_allclose((h / h[0])[shallow], (hr / hr[0])[shallow],
                               rtol=2e-3)
    # in the floor region only the order of magnitude is meaningful
    np.testing.assert_allclose((h / h[0])[~shallow],
                               (hr / hr[0])[~shallow], rtol=0.5)
    n = 64
    np.testing.assert_allclose(np.asarray(res.u)[: n + 1, : n + 1],
                               np.asarray(ref.u)[: n + 1, : n + 1],
                               rtol=1e-4, atol=1e-7)


def test_mesh_order4_is_fourth_order():
    """O(h^4) accuracy survives the distribution (f64 on a (2,2) mesh)."""
    errs = []
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    for lvl in (4, 5):
        n = 2 ** lvl
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=3,
                              dtype=jnp.float64)
        res = mg.solve_poisson(lvl, config=cfg, order=4, forcing=_forcing,
                               mesh=mesh, tol=1e-12, max_cycles=60)
        assert bool(res.converged)
        x = np.arange(n + 1) / n
        want = np.sin(math.pi * x)[None, :] * np.sin(math.pi * x)[:, None]
        got = np.asarray(res.u)[: n + 1, : n + 1]
        errs.append(np.abs(got - want).max())
    assert errs[0] / errs[1] == pytest.approx(16.0, rel=0.35), errs

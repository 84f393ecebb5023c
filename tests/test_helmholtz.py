"""Reaction-diffusion / shifted Poisson: -lap(u) + c u = f
(problems/helmholtz.py) — operator correctness, manufactured-solution
order, mesh-independent convergence, and variable/negative shifts."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.cycles import solve_until_tol
from tpu_multigrid.problems import HelmholtzProblem
from tpu_multigrid.utils import debug


def test_operator_reduces_to_poisson_at_zero_shift(rng):
    cfg = MultigridConfig(finest_level=4, coarsest_level=2,
                          dtype=jnp.float64)
    prob = HelmholtzProblem(cfg, shift=0.0)
    from tpu_multigrid.core.operators import poisson_op
    op = prob.finest
    pop = poisson_op(op.n, op.S)
    u = np.zeros((op.S, op.S))
    u[1:op.n, 1:op.n] = rng.standard_normal((op.n - 1, op.n - 1))
    u = jnp.asarray(u)
    np.testing.assert_allclose(np.asarray(op.apply(u)),
                               np.asarray(pop.apply(u)), atol=1e-12)


def test_operator_spd_and_transfer_sane():
    cfg = MultigridConfig(finest_level=4, coarsest_level=2,
                          dtype=jnp.float64)
    prob = HelmholtzProblem(cfg, shift=25.0)
    for op in prob.hierarchy.levels:
        debug.check_operator(op)


def test_manufactured_solution_order():
    """u = sin(pi x) sin(pi y), c = 7: f = (2 pi^2 + 7) u -> O(h^2)."""
    c = 7.0

    def forcing(x, y):
        return ((2 * math.pi ** 2 + c) * jnp.sin(math.pi * x)
                * jnp.sin(math.pi * y))

    errs = []
    for lvl in (4, 5, 6):
        n = 2 ** lvl
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              dtype=jnp.float64)
        prob = HelmholtzProblem(cfg, shift=c, forcing=forcing)
        res = solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-11,
                              max_cycles=40)
        assert bool(res.converged)
        from tpu_multigrid.core.grids import node_coordinates
        x, y = node_coordinates(n, n + 1, jnp.float64)
        exact = jnp.sin(math.pi * x) * jnp.sin(math.pi * y)
        err = np.asarray(res.u)[: n + 1, : n + 1] - np.asarray(exact)
        err[0, :] = err[-1, :] = 0.0
        err[:, 0] = err[:, -1] = 0.0
        errs.append(np.sqrt((err ** 2).mean()))
    assert errs[0] / errs[1] > 3.3
    assert errs[1] / errs[2] > 3.3


def test_convergence_mesh_independent_and_at_least_poisson_fast():
    """A positive shift strengthens the diagonal: rho must be <= the
    Poisson rate and flat in depth."""
    rhos = []
    for lvl in (4, 5, 6):
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              smoother="chebyshev", nu1=3, nu2=2,
                              dtype=jnp.float64)
        prob = HelmholtzProblem(cfg, shift=100.0)
        res = solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-10,
                              max_cycles=30)
        h = np.asarray(res.res_history)
        it = int(res.iterations)
        rhos.append((h[it] / h[0]) ** (1.0 / it))
    assert max(rhos) < 0.12
    assert max(rhos) - min(rhos) < 0.05


def test_variable_and_negative_shift():
    # variable c(x, y) >= 0
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float64)
    prob = HelmholtzProblem(
        cfg, shift=lambda x, y: 50.0 * (x + y))
    res = solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-10,
                          max_cycles=40)
    assert bool(res.converged)
    # mildly negative shift (c > -2 pi^2): still PD, still converges
    prob2 = HelmholtzProblem(cfg, shift=-10.0)
    res2 = solve_until_tol(prob2.hierarchy, cfg, prob2.rhs(), tol=1e-10,
                           max_cycles=60)
    assert bool(res2.converged)
    # shift-dependence sanity: more negative -> larger solution maximum
    assert float(jnp.max(res2.u)) > float(jnp.max(res.u))


def test_rejects_indefinite_shift():
    cfg = MultigridConfig(finest_level=4, coarsest_level=2)
    with pytest.raises(ValueError):
        HelmholtzProblem(cfg, shift=-4.1 * 16 ** 2)  # 4 + c h^2 <= 0


def test_api_entry():
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float64)
    res = mg.solve_helmholtz(5, shift=9.0, config=cfg, tol=1e-9)
    assert bool(res.converged)
    u = mg.extract_solution(res.u, 32)
    assert u.shape == (33, 33)
    # against the unshifted solve: the reaction term damps u
    res0 = mg.solve_poisson(5, config=cfg, tol=1e-9)
    u0 = mg.extract_solution(res0.u, 32)
    assert float(u[16, 16]) < float(u0[16, 16])

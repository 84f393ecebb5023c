"""FAS nonlinear multigrid (cycles/fas.py, core/nonlinear.py,
problems/bratu.py, problems/nldiffusion.py).

Tier strategy per SURVEY.md §4: operator correctness against closed
forms, the FAS→linear reduction invariant, manufactured-solution O(h²)
order, h-independent cycle rates, and the API drivers.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.core import ops
from tpu_multigrid.core.nonlinear import (PointwiseNonlinearOp,
                                          QuasilinearFluxOp,
                                          dense_poisson_matrix,
                                          inject_solution)
from tpu_multigrid.core.operators import poisson_op
from tpu_multigrid.cycles import cycle, solve_fixed
from tpu_multigrid.cycles.fas import (fas_cycle, fas_solve_fixed,
                                      fas_solve_until_tol, fmg_fas)
from tpu_multigrid.problems.bratu import (BratuProblem,
                                          build_pointwise_hierarchy)
from tpu_multigrid.problems.nldiffusion import QuasilinearDiffusionProblem
from tpu_multigrid.problems.poisson import poisson_rhs


def _interior_grid(n, S, rng, dtype=jnp.float64):
    u = np.zeros((S, S))
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    return jnp.asarray(u, dtype)


# ---------------------------------------------------------------------------
# Operator correctness
# ---------------------------------------------------------------------------

def test_pointwise_apply_matches_closed_form(rng):
    n, S = 16, 17
    lam = 2.0
    lin = poisson_op(n, S)
    op = PointwiseNonlinearOp(lin, lambda u: -lam * jnp.exp(u),
                              lambda u: -lam * jnp.exp(u))
    u = _interior_grid(n, S, rng)
    got = np.asarray(op.apply(u))
    un = np.asarray(u)
    h2 = (1.0 / n) ** 2
    want = np.zeros_like(un)
    for i in range(1, n):
        for j in range(1, n):
            want[i, j] = (4 * un[i, j] - un[i - 1, j] - un[i + 1, j]
                          - un[i, j - 1] - un[i, j + 1]
                          - lam * h2 * math.exp(un[i, j]))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quasilinear_apply_matches_closed_form(rng):
    n, S = 8, 9
    g = 1.5
    op = QuasilinearFluxOp(n, S, lambda u: 1.0 + g * u * u,
                           lambda u: 2.0 * g * u)
    u = _interior_grid(n, S, rng)
    got = np.asarray(op.apply(u))
    un = np.asarray(u)

    def a(v):
        return 1.0 + g * v * v

    want = np.zeros_like(un)
    for i in range(1, n):
        for j in range(1, n):
            s = 0.0
            for di, dj in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                ue = un[i + di, j + dj]
                s += a(0.5 * (un[i, j] + ue)) * (un[i, j] - ue)
            want[i, j] = s
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quasilinear_reduces_to_poisson_at_gamma_zero(rng):
    n, S = 16, 17
    op = QuasilinearFluxOp(n, S, lambda u: 1.0 + 0.0 * u,
                           lambda u: 0.0 * u)
    pop = poisson_op(n, S)
    u = _interior_grid(n, S, rng)
    np.testing.assert_allclose(np.asarray(op.apply(u)),
                               np.asarray(pop.apply(u)), atol=1e-12)


def test_dense_poisson_matrix_matches_probe():
    n = 8
    A = dense_poisson_matrix(n)
    pop = poisson_op(n, n + 1)
    m1 = n - 1
    for k in range(m1 * m1):
        e = np.zeros((n + 1, n + 1))
        e[1 + k // m1, 1 + k % m1] = 1.0
        col = np.asarray(pop.apply(jnp.asarray(e)))[1:n, 1:n].ravel()
        np.testing.assert_allclose(A[:, k], col, atol=1e-14)


def test_inject_solution_is_literal():
    n, Sf, Sc = 8, 9, 5
    u = jnp.asarray(np.arange(81, dtype=np.float64).reshape(9, 9))
    c = np.asarray(inject_solution(u, n, Sc))
    un = np.asarray(u)
    for i in range(1, 4):
        for j in range(1, 4):
            assert c[i, j] == un[2 * i, 2 * j]
    assert c[0].sum() == 0 and c[:, 0].sum() == 0 and c[4:].sum() == 0


# ---------------------------------------------------------------------------
# FAS == linear correction scheme for a linear operator
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cyc", ["V", "W", "F"])
def test_fas_reduces_to_linear_cycle(rng, cyc):
    """With phi = 0 (linear N), one FAS cycle must equal one linear cycle:
    the coarse solve of N_c(u_c) = N_c(u_hat) + r_hat from u_hat is the
    correction-scheme coarse solve shifted by u_hat.  Both sides use the
    smooth coarsest solver (the smoother iteration is affine, preserving
    the equivalence exactly)."""
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float64, coarse_solver="smooth",
                          coarse_smooth_sweeps=7, cycle=cyc)
    zero = lambda u: jnp.zeros_like(u)
    hier = build_pointwise_hierarchy(cfg, zero, zero)
    lin_hier = mg.build_poisson_hierarchy(cfg)

    n, S = hier.levels[0].n, hier.levels[0].S
    b = poisson_rhs(n, S, 4.0, jnp.float64)
    u0 = _interior_grid(n, S, rng)

    u_fas = fas_cycle(hier, cfg, u0, b)
    u_lin = cycle(lin_hier, cfg, u0, b)
    np.testing.assert_allclose(np.asarray(u_fas), np.asarray(u_lin),
                               rtol=0, atol=1e-12)


def test_fas_linear_with_newton_coarsest_matches_direct(rng):
    """phi = 0 with the dense-Newton coarsest == linear direct coarsest.

    The linear tier stores its precomputed coarse inverse in the solve
    dtype's default f32 (grids.coarse_dense_inverse), while the FAS
    Newton coarse solve is exact in f64 — so agreement is bounded by the
    linear side's f32 inverse application (~1e-8), not f64 roundoff."""
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float64, coarse_solver="direct")
    zero = lambda u: jnp.zeros_like(u)
    hier = build_pointwise_hierarchy(cfg, zero, zero)
    lin_hier = mg.build_poisson_hierarchy(cfg)
    n, S = hier.levels[0].n, hier.levels[0].S
    b = poisson_rhs(n, S, 4.0, jnp.float64)
    u0 = _interior_grid(n, S, rng)
    u_fas = fas_cycle(hier, cfg, u0, b)
    u_lin = cycle(lin_hier, cfg, u0, b)
    np.testing.assert_allclose(np.asarray(u_fas), np.asarray(u_lin),
                               rtol=0, atol=2e-7)


# ---------------------------------------------------------------------------
# Convergence: rates and manufactured solutions
# ---------------------------------------------------------------------------

def _bratu_cycle_rate(lvl, lam=5.0, cycles=8):
    cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                          dtype=jnp.float64)
    prob = BratuProblem(cfg, lam=lam)
    res = fas_solve_fixed(prob.hierarchy, cfg, prob.rhs(), cycles)
    hist = np.asarray(res.res_history)
    # asymptotic per-cycle contraction over the last few cycles
    return (hist[cycles] / hist[cycles - 3]) ** (1 / 3)


@pytest.mark.slow
def test_bratu_h_independent_rates():
    rates = [_bratu_cycle_rate(lvl) for lvl in (4, 5, 6)]
    assert all(r < 0.25 for r in rates), rates
    assert max(rates) - min(rates) < 0.12, rates


def test_bratu_manufactured_solution_order():
    """u* = sin(pi x) sin(pi y): f = 2 pi^2 u* - lam e^{u*} -> O(h^2)."""
    lam = 3.0

    def forcing(x, y):
        s = jnp.sin(math.pi * x) * jnp.sin(math.pi * y)
        return 2 * math.pi ** 2 * s - lam * jnp.exp(s)

    errs = []
    for lvl in (4, 5, 6):
        n = 2 ** lvl
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              dtype=jnp.float64)
        prob = BratuProblem(cfg, lam=lam, forcing=forcing)
        res = fas_solve_until_tol(prob.hierarchy, cfg, prob.rhs(),
                                  tol=1e-11, max_cycles=40)
        assert bool(res.converged)
        x = np.arange(n + 1) / n
        want = np.sin(math.pi * x)[None, :] * np.sin(math.pi * x)[:, None]
        got = np.asarray(res.u)[: n + 1, : n + 1]
        errs.append(np.abs(got - want).max())
    assert errs[0] / errs[1] == pytest.approx(4.0, rel=0.15)
    assert errs[1] / errs[2] == pytest.approx(4.0, rel=0.15)


def test_quasilinear_manufactured_solution_order():
    """a(u) = 1 + u^2, u* = x(1-x)y(1-y)*4 (peak 0.25):
    f = -div(a(u*) grad u*) computed symbolically."""
    # u* = 16 x(1-x) y(1-y) / 4 = 4 x(1-x) y(1-y); keep closed-form f via
    # f = -a'(u)(|grad u|^2) - a(u) lap u with a(u) = 1 + u^2.
    def ustar(x, y):
        return 4.0 * x * (1 - x) * y * (1 - y)

    def forcing(x, y):
        u = ustar(x, y)
        ux = 4.0 * (1 - 2 * x) * y * (1 - y)
        uy = 4.0 * x * (1 - x) * (1 - 2 * y)
        lap = -8.0 * y * (1 - y) - 8.0 * x * (1 - x)
        return -(2.0 * u) * (ux * ux + uy * uy) - (1 + u * u) * lap

    errs = []
    for lvl in (4, 5, 6):
        n = 2 ** lvl
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              dtype=jnp.float64, coarse_solver="smooth",
                              coarse_smooth_sweeps=60)
        prob = QuasilinearDiffusionProblem(cfg, gamma=1.0, forcing=forcing)
        res = fas_solve_until_tol(prob.hierarchy, cfg, prob.rhs(),
                                  tol=1e-10, max_cycles=60)
        assert bool(res.converged)
        x = np.arange(n + 1) / n
        want = ustar(x[None, :], x[:, None])
        got = np.asarray(res.u)[: n + 1, : n + 1]
        errs.append(np.abs(got - want).max())
    assert errs[0] / errs[1] == pytest.approx(4.0, rel=0.2)
    assert errs[1] / errs[2] == pytest.approx(4.0, rel=0.2)


def test_fas_solution_solves_discrete_system():
    """The converged FAS iterate satisfies the DISCRETE nonlinear system
    to the tolerance (independent of discretization error)."""
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float64)
    prob = BratuProblem(cfg, lam=5.0)
    b = prob.rhs()
    res = fas_solve_until_tol(prob.hierarchy, cfg, b, tol=1e-12,
                              max_cycles=60)
    assert bool(res.converged)
    op = prob.finest
    r = float(ops.norm2(op.residual(res.u, b)))
    r0 = float(ops.norm2(op.residual(jnp.zeros_like(res.u), b)))
    assert r <= 1e-12 * r0 * 1.01


def test_fmg_fas_one_cycle_reaches_discretization_error():
    """FMG-FAS + 1 cycle/level lands within a small factor of the
    discretization error (the textbook FMG guarantee, nonlinear case)."""
    lam = 3.0

    def forcing(x, y):
        s = jnp.sin(math.pi * x) * jnp.sin(math.pi * y)
        return 2 * math.pi ** 2 * s - lam * jnp.exp(s)

    lvl, n = 5, 32
    cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                          dtype=jnp.float64, nu0=1)
    prob = BratuProblem(cfg, lam=lam, forcing=forcing)
    u = fmg_fas(prob.hierarchy, cfg, prob.rhs_all_levels())
    x = np.arange(n + 1) / n
    want = np.sin(math.pi * x)[None, :] * np.sin(math.pi * x)[:, None]
    err_fmg = np.abs(np.asarray(u)[: n + 1, : n + 1] - want).max()
    res = fas_solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-12,
                              max_cycles=60)
    err_exact = np.abs(np.asarray(res.u)[: n + 1, : n + 1] - want).max()
    assert err_fmg <= 2.5 * err_exact, (err_fmg, err_exact)


# ---------------------------------------------------------------------------
# API drivers
# ---------------------------------------------------------------------------

def test_solve_bratu_api():
    res = mg.solve_bratu(5, lam=4.0, tol=1e-10,
                         config=MultigridConfig(finest_level=5,
                                                coarsest_level=2,
                                                dtype=jnp.float64))
    assert bool(res.converged)
    u = np.asarray(res.u)
    assert u[1:32, 1:32].min() > 0  # lower branch is positive
    assert np.isfinite(u).all()


def test_solve_nonlinear_poisson_api_cubic():
    """phi(u) = u^3 (monotone nonlinearity): converges from zero."""
    res = mg.solve_nonlinear_poisson(
        5, phi=lambda u: u ** 3, dphi=lambda u: 3 * u * u,
        forcing=10.0, tol=1e-10,
        config=MultigridConfig(finest_level=5, coarsest_level=2,
                               dtype=jnp.float64))
    assert bool(res.converged)


def test_solve_quasilinear_api_with_fmg():
    kw = dict(gamma=2.0, forcing=8.0, tol=1e-9,
              config=MultigridConfig(finest_level=5, coarsest_level=2,
                                     dtype=jnp.float64,
                                     coarse_solver="smooth",
                                     coarse_smooth_sweeps=60))
    res = mg.solve_quasilinear_diffusion(5, use_fmg=True, **kw)
    assert bool(res.converged)
    cold = mg.solve_quasilinear_diffusion(5, use_fmg=False, **kw)
    assert bool(cold.converged)
    # the FMG-FAS head start must not cost cycles vs a cold start
    assert int(res.iterations) <= int(cold.iterations)


@pytest.mark.slow
def test_bratu_near_critical_lambda():
    """lam = 6.0 (near lam* ~ 6.81): FAS still converges on the lower
    branch, where Newton from zero without globalization struggles."""
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float64, cycle="W")
    prob = BratuProblem(cfg, lam=6.0)
    res = fas_solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-10,
                              max_cycles=80)
    assert bool(res.converged)

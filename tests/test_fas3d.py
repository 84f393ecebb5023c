"""3D FAS nonlinear multigrid (cycles/fas.py ndim==3 branches,
core/nonlinear.py 3D ops, problems/bratu.py + nldiffusion.py 3D problems).

Mirrors the 2D battery in test_fas.py (VERDICT r3 next #2: the 3D
nonlinear surface shipped untested): operator closed forms, the
FAS->linear reduction invariant, manufactured-solution O(h^2) order,
h-independent rates, FMG-FAS, and the API entries.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.core import ops
from tpu_multigrid.core.nonlinear import (PointwiseNonlinearOp,
                                          QuasilinearFluxOp3,
                                          inject_solution3)
from tpu_multigrid.core.operators import ConstStencilOp3D
from tpu_multigrid.cycles import cycle
from tpu_multigrid.cycles.fas import (fas_cycle, fas_solve_fixed,
                                      fas_solve_until_tol, fmg_fas)
from tpu_multigrid.problems.bratu import (Bratu3DProblem,
                                          build_pointwise_hierarchy3)
from tpu_multigrid.problems.nldiffusion import QuasilinearDiffusion3DProblem
from tpu_multigrid.problems.poisson3d import (build_poisson3d_hierarchy,
                                              poisson3d_rhs)


def _interior_grid3(n, S, rng, dtype=jnp.float64):
    u = np.zeros((S, S, S))
    u[1:n, 1:n, 1:n] = rng.standard_normal((n - 1, n - 1, n - 1))
    return jnp.asarray(u, dtype)


# ---------------------------------------------------------------------------
# Operator correctness (closed-form oracles)
# ---------------------------------------------------------------------------

def test_pointwise3_apply_matches_closed_form(rng):
    n, S = 8, 9
    lam = 2.0
    op = PointwiseNonlinearOp(ConstStencilOp3D(n, S),
                              lambda u: -lam * jnp.exp(u),
                              lambda u: -lam * jnp.exp(u), diag=6.0)
    u = _interior_grid3(n, S, rng)
    got = np.asarray(op.apply(u))
    un = np.asarray(u)
    h2 = (1.0 / n) ** 2
    want = np.zeros_like(un)
    for i in range(1, n):
        for j in range(1, n):
            for k in range(1, n):
                want[i, j, k] = (6 * un[i, j, k]
                                 - un[i - 1, j, k] - un[i + 1, j, k]
                                 - un[i, j - 1, k] - un[i, j + 1, k]
                                 - un[i, j, k - 1] - un[i, j, k + 1]
                                 - lam * h2 * math.exp(un[i, j, k]))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quasilinear3_apply_matches_closed_form(rng):
    n, S = 6, 7
    g = 1.5
    op = QuasilinearFluxOp3(n, S, lambda u: 1.0 + g * u * u,
                            lambda u: 2.0 * g * u)
    u = _interior_grid3(n, S, rng)
    got = np.asarray(op.apply(u))
    un = np.asarray(u)

    def a(v):
        return 1.0 + g * v * v

    want = np.zeros_like(un)
    nbrs = ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
            (0, 0, 1), (0, 0, -1))
    for i in range(1, n):
        for j in range(1, n):
            for k in range(1, n):
                s = 0.0
                for di, dj, dk in nbrs:
                    ue = un[i + di, j + dj, k + dk]
                    s += a(0.5 * (un[i, j, k] + ue)) * (un[i, j, k] - ue)
                want[i, j, k] = s
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quasilinear3_reduces_to_poisson_at_gamma_zero(rng):
    n, S = 8, 9
    op = QuasilinearFluxOp3(n, S, lambda u: 1.0 + 0.0 * u,
                            lambda u: 0.0 * u)
    pop = ConstStencilOp3D(n, S)
    u = _interior_grid3(n, S, rng)
    np.testing.assert_allclose(np.asarray(op.apply(u)),
                               np.asarray(pop.apply(u)), atol=1e-12)


def test_inject_solution3_is_literal():
    n, Sc = 8, 5
    u = jnp.asarray(np.arange(9 ** 3, dtype=np.float64).reshape(9, 9, 9))
    c = np.asarray(inject_solution3(u, n, (Sc, Sc, Sc)))
    un = np.asarray(u)
    for i in range(1, 4):
        for j in range(1, 4):
            for k in range(1, 4):
                assert c[i, j, k] == un[2 * i, 2 * j, 2 * k]
    assert c[0].sum() == 0 and c[:, 0].sum() == 0 and c[:, :, 0].sum() == 0
    assert c[4:].sum() == 0


# ---------------------------------------------------------------------------
# FAS == linear correction scheme for a linear operator (3D)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cyc", ["V", "W", "F"])
def test_fas3_reduces_to_linear_cycle(rng, cyc):
    cfg = MultigridConfig(finest_level=4, coarsest_level=2,
                          dtype=jnp.float64, coarse_solver="smooth",
                          coarse_smooth_sweeps=7, cycle=cyc)
    zero = lambda u: jnp.zeros_like(u)
    hier = build_pointwise_hierarchy3(cfg, zero, zero)
    lin_hier = build_poisson3d_hierarchy(cfg)

    op = hier.levels[0]
    b = poisson3d_rhs(op.n, op.grid_shape, 6.0, jnp.float64)
    u0 = _interior_grid3(op.n, op.S, rng)

    u_fas = fas_cycle(hier, cfg, u0, b)
    u_lin = cycle(lin_hier, cfg, u0, b)
    np.testing.assert_allclose(np.asarray(u_fas), np.asarray(u_lin),
                               rtol=0, atol=1e-12)


def test_fas3_linear_with_newton_coarsest_matches_direct(rng):
    cfg = MultigridConfig(finest_level=4, coarsest_level=2,
                          dtype=jnp.float64, coarse_solver="direct")
    zero = lambda u: jnp.zeros_like(u)
    hier = build_pointwise_hierarchy3(cfg, zero, zero)
    lin_hier = build_poisson3d_hierarchy(cfg)
    op = hier.levels[0]
    b = poisson3d_rhs(op.n, op.grid_shape, 6.0, jnp.float64)
    u0 = _interior_grid3(op.n, op.S, rng)
    u_fas = fas_cycle(hier, cfg, u0, b)
    u_lin = cycle(lin_hier, cfg, u0, b)
    np.testing.assert_allclose(np.asarray(u_fas), np.asarray(u_lin),
                               rtol=0, atol=2e-7)


# ---------------------------------------------------------------------------
# Convergence: rates and manufactured solutions
# ---------------------------------------------------------------------------

def _bratu3_cycle_rate(lvl, lam=5.0, cycles=8):
    cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                          dtype=jnp.float64)
    prob = Bratu3DProblem(cfg, lam=lam)
    res = fas_solve_fixed(prob.hierarchy, cfg, prob.rhs(), cycles)
    hist = np.asarray(res.res_history)
    return (hist[cycles] / hist[cycles - 3]) ** (1 / 3)


@pytest.mark.slow
def test_bratu3_h_independent_rates():
    # Measured asymptotic rate of V(2,2) Jacobi-Newton (omega=2/3) on the
    # 3D 7-point operator: ~0.30/0.35/0.37 at levels 3/4/5 (the 2D bar of
    # 0.25 does not transfer — omega=2/3 damping is tuned for the 2D
    # 5-point spectrum; 3D smoothing at this omega is weaker).  The test
    # pins h-independence (bounded spread) and the textbook-order rate.
    rates = [_bratu3_cycle_rate(lvl) for lvl in (3, 4, 5)]
    assert all(r < 0.40 for r in rates), rates
    assert max(rates) - min(rates) < 0.12, rates


def test_bratu3_manufactured_solution_order():
    """u* = sin(pi x) sin(pi y) sin(pi z):
    f = 3 pi^2 u* - lam e^{u*} -> O(h^2)."""
    lam = 3.0

    def forcing(x, y, z):
        s = (jnp.sin(math.pi * x) * jnp.sin(math.pi * y)
             * jnp.sin(math.pi * z))
        return 3 * math.pi ** 2 * s - lam * jnp.exp(s)

    errs = []
    for lvl in (3, 4, 5):
        n = 2 ** lvl
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              dtype=jnp.float64)
        prob = Bratu3DProblem(cfg, lam=lam, forcing=forcing)
        res = fas_solve_until_tol(prob.hierarchy, cfg, prob.rhs(),
                                  tol=1e-11, max_cycles=40)
        assert bool(res.converged)
        x = np.arange(n + 1) / n
        s1 = np.sin(math.pi * x)
        want = s1[:, None, None] * s1[None, :, None] * s1[None, None, :]
        got = np.asarray(res.u)[: n + 1, : n + 1, : n + 1]
        errs.append(np.abs(got - want).max())
    assert errs[0] / errs[1] == pytest.approx(4.0, rel=0.2)
    assert errs[1] / errs[2] == pytest.approx(4.0, rel=0.2)


def test_quasilinear3_manufactured_solution_order():
    """a(u) = 1 + u^2, u* = 8 x(1-x) y(1-y) z(1-z):
    f = -a'(u)|grad u|^2 - a(u) lap u, closed form."""
    k = 8.0

    def ustar(x, y, z):
        return k * x * (1 - x) * y * (1 - y) * z * (1 - z)

    def forcing(x, y, z):
        X, Y, Z = x * (1 - x), y * (1 - y), z * (1 - z)
        u = k * X * Y * Z
        ux = k * (1 - 2 * x) * Y * Z
        uy = k * X * (1 - 2 * y) * Z
        uz = k * X * Y * (1 - 2 * z)
        lap = -2.0 * k * (Y * Z + X * Z + X * Y)
        return -(2.0 * u) * (ux * ux + uy * uy + uz * uz) - (1 + u * u) * lap

    errs = []
    for lvl in (3, 4, 5):
        n = 2 ** lvl
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              dtype=jnp.float64, coarse_solver="smooth",
                              coarse_smooth_sweeps=60)
        prob = QuasilinearDiffusion3DProblem(cfg, gamma=1.0, forcing=forcing)
        res = fas_solve_until_tol(prob.hierarchy, cfg, prob.rhs(),
                                  tol=1e-10, max_cycles=60)
        assert bool(res.converged)
        x = np.arange(n + 1) / n
        want = ustar(x[:, None, None], x[None, :, None], x[None, None, :])
        got = np.asarray(res.u)[: n + 1, : n + 1, : n + 1]
        errs.append(np.abs(got - want).max())
    assert errs[0] / errs[1] == pytest.approx(4.0, rel=0.25)
    assert errs[1] / errs[2] == pytest.approx(4.0, rel=0.25)


def test_fas3_solution_solves_discrete_system():
    cfg = MultigridConfig(finest_level=4, coarsest_level=2,
                          dtype=jnp.float64)
    prob = Bratu3DProblem(cfg, lam=5.0)
    b = prob.rhs()
    res = fas_solve_until_tol(prob.hierarchy, cfg, b, tol=1e-12,
                              max_cycles=60)
    assert bool(res.converged)
    op = prob.finest
    r = float(ops.norm2(op.residual(res.u, b)))
    r0 = float(ops.norm2(op.residual(jnp.zeros_like(res.u), b)))
    assert r <= 1e-12 * r0 * 1.01


def test_fmg_fas3_one_cycle_reaches_discretization_error():
    lam = 3.0

    def forcing(x, y, z):
        s = (jnp.sin(math.pi * x) * jnp.sin(math.pi * y)
             * jnp.sin(math.pi * z))
        return 3 * math.pi ** 2 * s - lam * jnp.exp(s)

    lvl, n = 4, 16
    cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                          dtype=jnp.float64, nu0=1)
    prob = Bratu3DProblem(cfg, lam=lam, forcing=forcing)
    u = fmg_fas(prob.hierarchy, cfg, prob.rhs_all_levels())
    x = np.arange(n + 1) / n
    s1 = np.sin(math.pi * x)
    want = s1[:, None, None] * s1[None, :, None] * s1[None, None, :]
    err_fmg = np.abs(np.asarray(u)[: n + 1, : n + 1, : n + 1] - want).max()
    res = fas_solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-12,
                              max_cycles=60)
    err_exact = np.abs(
        np.asarray(res.u)[: n + 1, : n + 1, : n + 1] - want).max()
    assert err_fmg <= 2.5 * err_exact, (err_fmg, err_exact)


# ---------------------------------------------------------------------------
# API drivers
# ---------------------------------------------------------------------------

def test_solve_bratu3d_api():
    res = mg.solve_bratu(4, lam=4.0, ndim=3, tol=1e-10,
                         config=MultigridConfig(finest_level=4,
                                                coarsest_level=2,
                                                dtype=jnp.float64))
    assert bool(res.converged)
    u = np.asarray(res.u)
    assert u.ndim == 3
    assert u[1:16, 1:16, 1:16].min() > 0  # lower branch is positive
    assert np.isfinite(u).all()


def test_solve_nonlinear_poisson3d_api_cubic():
    res = mg.solve_nonlinear_poisson(
        4, phi=lambda u: u ** 3, dphi=lambda u: 3 * u * u, ndim=3,
        forcing=10.0, tol=1e-10,
        config=MultigridConfig(finest_level=4, coarsest_level=2,
                               dtype=jnp.float64))
    assert bool(res.converged)


def test_solve_quasilinear3d_api_with_fmg():
    kw = dict(gamma=2.0, forcing=8.0, tol=1e-9, ndim=3,
              config=MultigridConfig(finest_level=4, coarsest_level=2,
                                     dtype=jnp.float64,
                                     coarse_solver="smooth",
                                     coarse_smooth_sweeps=60))
    res = mg.solve_quasilinear_diffusion(4, use_fmg=True, **kw)
    assert bool(res.converged)
    cold = mg.solve_quasilinear_diffusion(4, use_fmg=False, **kw)
    assert bool(cold.converged)
    assert int(res.iterations) <= int(cold.iterations)


def test_fas_warns_on_nonjacobi_smoother():
    cfg = MultigridConfig(finest_level=4, coarsest_level=2,
                          dtype=jnp.float64, smoother="rbgs")
    with pytest.warns(UserWarning, match="weighted Jacobi-Newton"):
        res = mg.solve_bratu(4, lam=2.0, config=cfg, tol=1e-8)
    assert bool(res.converged)

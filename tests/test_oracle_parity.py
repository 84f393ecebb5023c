"""Full-solve parity vs an independent scipy sparse oracle (SURVEY.md §4
tier 3), including a numpy replica of the reference's *intended* FMG
schedule on the 33x33 config (BASELINE config 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid import (MultigridConfig, PoissonProblem, fmg, solve_fixed,
                           solve_until_tol)
from tpu_multigrid.api import extract_solution, solve_diffusion, solve_poisson
from tpu_multigrid import oracle
from tpu_multigrid.problems.diffusion import DiffusionProblem, cell_coefficients


def test_poisson_33x33_matches_oracle_1e10():
    """BASELINE config 1: 33x33, 3-level V-cycle, Jacobi (2,2) —
    solution matches the CPU sparse direct solve to <=1e-10 rel L2."""
    cfg = MultigridConfig(finest_level=5, coarsest_level=3, nu1=2, nu2=2,
                          dtype=jnp.float64)
    res = solve_poisson(5, config=cfg, tol=1e-13, max_cycles=60)
    assert bool(res.converged)
    u = np.asarray(extract_solution(res.u, 32))
    uo = oracle.solve_poisson_oracle(32)
    rel = np.linalg.norm(u - uo) / np.linalg.norm(uo)
    assert rel < 1e-10, rel


@pytest.mark.parametrize("lvl", [6, 7])
def test_poisson_larger_grids_match_oracle(lvl):
    n = 2 ** lvl
    cfg = MultigridConfig(finest_level=lvl, coarsest_level=3,
                          dtype=jnp.float64)
    res = solve_poisson(lvl, config=cfg, tol=1e-12, max_cycles=60)
    assert bool(res.converged)
    u = np.asarray(extract_solution(res.u, n))
    uo = oracle.solve_poisson_oracle(n)
    rel = np.linalg.norm(u - uo) / np.linalg.norm(uo)
    assert rel < 1e-10, rel


def test_poisson_nonconstant_forcing_matches_oracle():
    f = lambda x, y: np.sin(np.pi * x) * np.sin(2 * np.pi * y) + 1.0
    fj = lambda x, y: jnp.sin(jnp.pi * x) * jnp.sin(2 * jnp.pi * y) + 1.0
    n = 64
    cfg = MultigridConfig(finest_level=6, coarsest_level=3, dtype=jnp.float64)
    res = solve_poisson(6, config=cfg, forcing=fj, tol=1e-12, max_cycles=60)
    assert bool(res.converged)
    u = np.asarray(extract_solution(res.u, n))
    uo = oracle.solve_poisson_oracle(n, f=f)
    rel = np.linalg.norm(u - uo) / np.linalg.norm(uo)
    assert rel < 1e-10, rel


def test_manufactured_solution_discretization_order():
    """u = sin(pi x) sin(pi y), f = 2 pi^2 u: discrete solution converges to
    the exact solution at O(h^2)."""
    errs = []
    for lvl in (4, 5, 6):
        n = 2 ** lvl
        fj = lambda x, y: 2 * jnp.pi ** 2 * jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=3,
                              dtype=jnp.float64)
        res = solve_poisson(lvl, config=cfg, forcing=fj, tol=1e-12,
                            max_cycles=60)
        u = np.asarray(extract_solution(res.u, n))
        x = np.arange(n + 1) / n
        xx = np.broadcast_to(x[None, :], (n + 1, n + 1))
        yy = np.broadcast_to(x[:, None], (n + 1, n + 1))
        exact = np.sin(np.pi * xx) * np.sin(np.pi * yy)
        errs.append(np.max(np.abs(u - exact)))
    rates = [errs[i] / errs[i + 1] for i in range(len(errs) - 1)]
    assert all(r > 3.5 for r in rates), (errs, rates)  # O(h^2) => factor ~4


def test_diffusion_matches_oracle():
    """BASELINE config 4 (small instance): variable-coefficient diffusion
    with Galerkin coarse operators matches the sparse direct solve."""
    a_np = lambda x, y: 1.0 + 10.0 * np.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) * 8)
    a_j = lambda x, y: 1.0 + 10.0 * jnp.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) * 8)
    n = 64
    cfg = MultigridConfig(finest_level=6, coarsest_level=3, dtype=jnp.float64)
    res = solve_diffusion(6, coefficient=a_j, config=cfg, tol=1e-12,
                          max_cycles=80)
    assert bool(res.converged)
    u = np.asarray(extract_solution(res.u, n))
    cells = np.asarray(cell_coefficients(n, a_np, np.float64))
    uo = oracle.solve_diffusion_oracle(n, cells)
    rel = np.linalg.norm(u - uo) / np.linalg.norm(uo)
    assert rel < 1e-10, rel


def test_diffusion_discontinuous_coefficient_converges():
    """Jumping coefficient (4 orders of magnitude): Galerkin coarsening keeps
    multigrid converging."""
    a_j = lambda x, y: jnp.where((x > 0.5) ^ (y > 0.5), 1e2, 1e-2)
    cfg = MultigridConfig(finest_level=6, coarsest_level=3, dtype=jnp.float64,
                          smoother="rbgs", nu1=2, nu2=2)
    res = solve_diffusion(6, coefficient=a_j, config=cfg, tol=1e-8,
                          max_cycles=60)
    assert bool(res.converged), np.asarray(res.res_history)


# ---------------------------------------------------------------------------
# Reference-schedule parity: numpy replica of the intended v1 semantics
# ---------------------------------------------------------------------------

def _numpy_reference_fmg(n_fine, coarsest, nu0, nu1, nu2, omega):
    """Numpy replica of the reference's intended FMG
    (Poissons_SYCL.cpp:629-650 with the restriction bug fixed and the same
    FEM scaling conventions as the framework): weighted Jacobi, V-cycles with
    extra smoothing at the coarsest level, restricted-RHS FMG."""

    def jac(u, b, n, sweeps):
        for _ in range(sweeps):
            nbr = (np.roll(u, 1, 0) + np.roll(u, -1, 0)
                   + np.roll(u, 1, 1) + np.roll(u, -1, 1))
            un = (1 - omega) * u + omega * 0.25 * (b + nbr)
            u = np.zeros_like(u)
            u[1:n, 1:n] = un[1:n, 1:n]
        return u

    def resid(u, b, n):
        nbr = (np.roll(u, 1, 0) + np.roll(u, -1, 0)
               + np.roll(u, 1, 1) + np.roll(u, -1, 1))
        r = np.zeros_like(u)
        r[1:n, 1:n] = (b - 4 * u + nbr)[1:n, 1:n]
        return r

    def restrict(r, nf):
        nc = nf // 2
        c = np.zeros((nc + 1, nc + 1))
        fi = r
        c[1:nc, 1:nc] = (
            4 * fi[2:-2:2, 2:-2:2]
            + 2 * (fi[1:-3:2, 2:-2:2] + fi[3:-1:2, 2:-2:2]
                   + fi[2:-2:2, 1:-3:2] + fi[2:-2:2, 3:-1:2])
            + fi[1:-3:2, 1:-3:2] + fi[1:-3:2, 3:-1:2]
            + fi[3:-1:2, 1:-3:2] + fi[3:-1:2, 3:-1:2]
        ) / 4.0
        return c

    def prolong(c, nc):
        nf = 2 * nc
        f = np.zeros((nf + 1, nf + 1))
        f[0::2, 0::2] = c
        f[1::2, 0::2] = 0.5 * (c[:-1, :] + c[1:, :])
        f[0::2, 1::2] = 0.5 * (c[:, :-1] + c[:, 1:])
        f[1::2, 1::2] = 0.25 * (c[:-1, :-1] + c[1:, :-1]
                                + c[:-1, 1:] + c[1:, 1:])
        f[0, :] = f[-1, :] = 0
        f[:, 0] = f[:, -1] = 0
        return f

    def vcycle(u, b, n):
        if n == coarsest:
            return jac(u, b, n, nu2)  # Poissons_SYCL.cpp:583-587
        u = jac(u, b, n, nu1)
        rc = restrict(resid(u, b, n), n)
        ec = vcycle(np.zeros_like(rc), rc, n // 2)
        u = u + prolong(ec, n // 2)
        return jac(u, b, n, nu2)

    h2 = (1.0 / n_fine) ** 2
    b = np.zeros((n_fine + 1, n_fine + 1))
    b[1:n_fine, 1:n_fine] = 4.0 * h2
    bs = {n_fine: b}
    n = n_fine
    while n > coarsest:
        bs[n // 2] = restrict(bs[n], n)
        n //= 2
    u = np.zeros((coarsest + 1, coarsest + 1))
    for _ in range(nu0):
        u = vcycle(u, bs[coarsest], coarsest)
    n = coarsest
    while n < n_fine:
        u = prolong(u, n)
        n *= 2
        for _ in range(nu0):
            u = vcycle(u, bs[n], n)
    return u


def test_reference_fmg_schedule_parity():
    """Framework FMG with the reference schedule (coarse smoothing, restricted
    RHS, weighted Jacobi) reproduces an independent numpy replica exactly."""
    cfg = MultigridConfig(
        finest_level=5, coarsest_level=3, nu1=3, nu2=3, nu0=2,
        omega=2.0 / 3.0, smoother="jacobi", coarse_solver="smooth",
        coarse_smooth_sweeps=3, fmg_rhs="restrict", dtype=jnp.float64)
    prob = PoissonProblem(cfg)
    b = prob.rhs()
    u = np.asarray(jax.jit(lambda b: fmg(prob.hierarchy, cfg, b))(b))
    want = _numpy_reference_fmg(32, 8, nu0=2, nu1=3, nu2=3, omega=2.0 / 3.0)
    np.testing.assert_allclose(u[:33, :33], want, rtol=1e-12, atol=1e-13)

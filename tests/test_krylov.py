"""Multigrid-preconditioned CG tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid import MultigridConfig, PoissonProblem, solve_until_tol
from tpu_multigrid.krylov import pcg_solve
from tpu_multigrid.problems import DiffusionProblem
from tpu_multigrid import oracle
from tpu_multigrid.api import extract_solution


def test_pcg_poisson_matches_oracle():
    cfg = MultigridConfig(finest_level=5, coarsest_level=3, dtype=jnp.float64)
    prob = PoissonProblem(cfg)
    b = prob.rhs()
    res = jax.jit(lambda h, b: pcg_solve(h, cfg, b, tol=1e-12,
                                         max_iters=40))(prob.hierarchy, b)
    assert bool(res.converged)
    u = np.asarray(extract_solution(res.u, 32))
    uo = oracle.solve_poisson_oracle(32)
    rel = np.linalg.norm(u - uo) / np.linalg.norm(uo)
    assert rel < 1e-10, rel


def test_pcg_converges_faster_than_plain_cycles():
    """PCG accelerates plain V-cycle iteration (same work per iteration)."""
    cfg = MultigridConfig(finest_level=6, coarsest_level=3, dtype=jnp.float64)
    prob = PoissonProblem(cfg)
    b = prob.rhs()
    plain = solve_until_tol(prob.hierarchy, cfg, b, tol=1e-10, max_cycles=50)
    pcg = jax.jit(lambda h, b: pcg_solve(h, cfg, b, tol=1e-10,
                                         max_iters=50))(prob.hierarchy, b)
    assert bool(pcg.converged)
    assert int(pcg.iterations) <= int(plain.iterations)


def test_pcg_robust_on_hard_coefficients():
    """4-orders-of-magnitude checkerboard coefficient: PCG converges."""
    a = lambda x, y: jnp.where((x > 0.5) ^ (y > 0.5), 1e2, 1e-2)
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          smoother="rbgs", nu1=1, nu2=1, dtype=jnp.float64)
    prob = DiffusionProblem(cfg, coefficient=a)
    b = prob.rhs()
    res = jax.jit(lambda h, b: pcg_solve(h, cfg, b, tol=1e-10,
                                         max_iters=60))(prob.hierarchy, b)
    assert bool(res.converged), np.asarray(res.res_history)

"""LFA + measured convergence factors (textbook values)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid import MultigridConfig, PoissonProblem
from tpu_multigrid import analysis


def test_lfa_smoothing_factors_textbook():
    # omega = 4/5 is optimal with factor 3/5
    assert abs(analysis.smoothing_factor(0.8) - 0.6) < 0.01
    # omega = 2/3 (the reference's choice): factor 2/3 (attained at
    # theta=(pi/2, 0): |1 - omega/2|)
    f = analysis.smoothing_factor(2.0 / 3.0)
    assert abs(f - 2.0 / 3.0) < 0.01
    # unweighted Jacobi does not smooth in 2D
    assert analysis.smoothing_factor(1.0) > 0.98


def test_optimal_omega_is_four_fifths():
    # The value the reference's `4/5` integer division destroyed
    # (Multigrid_functions.cpp:48).
    assert abs(analysis.optimal_jacobi_omega() - 0.8) < 0.02


@pytest.mark.parametrize("smoother,nu,bound", [("jacobi", 2, 0.25),
                                               ("rbgs", 1, 0.15)])
def test_measured_vcycle_factor(smoother, nu, bound):
    cfg = MultigridConfig(finest_level=6, coarsest_level=3, nu1=nu, nu2=nu,
                          smoother=smoother, dtype=jnp.float64)
    prob = PoissonProblem(cfg)
    rho = analysis.measured_convergence_factor(prob.hierarchy, cfg)
    assert rho < bound, rho


def test_measured_factor_matches_schedule_quality():
    """More smoothing -> better factor (sanity ordering)."""
    rhos = []
    for nu in (1, 2, 3):
        cfg = MultigridConfig(finest_level=5, coarsest_level=3, nu1=nu,
                              nu2=nu, dtype=jnp.float64)
        prob = PoissonProblem(cfg)
        rhos.append(analysis.measured_convergence_factor(prob.hierarchy, cfg))
    assert rhos[0] > rhos[1] > rhos[2], rhos

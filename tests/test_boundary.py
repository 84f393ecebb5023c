"""Inhomogeneous Dirichlet boundary conditions via lifting (beyond the
reference, which hard-eliminates homogeneous boundary rows at
``Poissons_SYCL.cpp:224,263``): u = w + G with A w = b - A G."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_multigrid as mg


def _exact_grid(n, fn):
    xs = np.arange(n + 1) / n
    return fn(xs[None, :], xs[:, None])


def test_manufactured_quadratic_is_exact():
    """u* = x^2 + y^2: the 5-point Laplacian is exact on quadratics, so the
    discrete solution must equal u* at the nodes to solver tolerance."""
    cfg = mg.MultigridConfig(finest_level=6, coarsest_level=3,
                             dtype=jnp.float64)
    res = mg.solve_poisson(6, config=cfg, forcing=-4.0,
                           boundary=lambda x, y: x ** 2 + y ** 2, tol=1e-12)
    assert bool(res.converged)
    u = np.asarray(mg.extract_solution(res.u, 64))
    ex = _exact_grid(64, lambda x, y: x ** 2 + y ** 2)
    assert np.abs(u - ex).max() < 1e-10


def test_constant_boundary_constant_solution():
    """f = 0, g = 5 => u == 5 everywhere (discrete maximum principle)."""
    cfg = mg.MultigridConfig(finest_level=5, coarsest_level=3,
                             dtype=jnp.float64)
    res = mg.solve_poisson(5, config=cfg, forcing=0.0, boundary=5.0,
                           tol=1e-12, max_cycles=40)
    u = np.asarray(mg.extract_solution(res.u, 32))
    assert np.abs(u - 5.0).max() < 1e-10


def test_diffusion_boundary_lifting():
    """Constant-coefficient diffusion with lifting matches the Poisson
    manufactured solution; variable coefficients still converge."""
    cfg = mg.MultigridConfig(finest_level=5, coarsest_level=3,
                             dtype=jnp.float64)
    res = mg.solve_diffusion(5, coefficient=1.0, forcing=-4.0, config=cfg,
                             boundary=lambda x, y: x ** 2 + y ** 2,
                             tol=1e-12)
    u = np.asarray(mg.extract_solution(res.u, 32))
    ex = _exact_grid(32, lambda x, y: x ** 2 + y ** 2)
    assert np.abs(u - ex).max() < 1e-10

    res2 = mg.solve_diffusion(5, coefficient=lambda x, y: 1.0 + 10 * x * y,
                              forcing=1.0, config=cfg, boundary=1.0,
                              tol=1e-10)
    assert bool(res2.converged)


def test_boundary_composes_with_fmg_and_refined():
    cfg64 = mg.MultigridConfig(finest_level=5, coarsest_level=3,
                               dtype=jnp.float64)
    ref = mg.solve_poisson(5, config=cfg64, forcing=-4.0,
                           boundary=lambda x, y: x ** 2 + y ** 2, tol=1e-12)
    fmg_res = mg.solve_poisson(5, config=cfg64, forcing=-4.0,
                               boundary=lambda x, y: x ** 2 + y ** 2,
                               tol=1e-12, use_fmg=True)
    np.testing.assert_allclose(np.asarray(fmg_res.u), np.asarray(ref.u),
                               rtol=0, atol=1e-10)

    cfg32 = mg.MultigridConfig(finest_level=5, coarsest_level=3,
                               dtype=jnp.float32)
    rref = mg.solve_poisson(5, config=cfg32, forcing=-4.0,
                            boundary=lambda x, y: x ** 2 + y ** 2,
                            tol=1e-9, refined=True)
    u = np.asarray(mg.extract_solution(rref.u, 32), np.float64)
    ex = _exact_grid(32, lambda x, y: x ** 2 + y ** 2)
    assert np.abs(u - ex).max() < 1e-6

"""3D variable-coefficient diffusion (problems/diffusion3d.py):
flux-stencil correctness, SPD, O(h²) manufactured order, and
mesh-independent convergence with a coefficient contrast."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.core.operators import ConstStencilOp3D, diffusion_op3_host
from tpu_multigrid.cycles import solve_until_tol
from tpu_multigrid.problems import Diffusion3DProblem
from tpu_multigrid.utils import debug


def test_unit_coefficient_reduces_to_poisson(rng):
    n, S, Sx = 8, 16, 128
    op = diffusion_op3_host(np.ones((n, n, n)), n, S, Sx)
    pop = ConstStencilOp3D(n, S, Sx)
    u = np.zeros((S, S, Sx))
    u[1:n, 1:n, 1:n] = rng.standard_normal((n - 1,) * 3)
    u = jnp.asarray(u)
    np.testing.assert_allclose(np.asarray(op.apply(u)),
                               np.asarray(pop.apply(u)), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(op.smooth(u, pop.apply(u), smoother="jacobi",
                             omega=2 / 3, sweeps=3)),
        np.asarray(pop.smooth(u, pop.apply(u), smoother="jacobi",
                              omega=2 / 3, sweeps=3)), atol=1e-12)


def test_operator_spd(rng):
    n, S, Sx = 8, 16, 128
    cells = np.exp(rng.standard_normal((n, n, n)))
    op = diffusion_op3_host(cells, n, S, Sx)
    debug.check_operator(op, rng)


def test_manufactured_solution_order():
    """a = 1 + x, u = sin(pi x) sin(pi y) sin(pi z):
    f = -div(a grad u) = 3 pi^2 a u - pi cos(pi x) sin(pi y) sin(pi z)."""
    def a(x, y, z):
        return 1.0 + x

    def forcing(x, y, z):
        s = (jnp.sin(math.pi * x) * jnp.sin(math.pi * y)
             * jnp.sin(math.pi * z))
        return (3 * math.pi ** 2 * (1.0 + x) * s
                - math.pi * jnp.cos(math.pi * x) * jnp.sin(math.pi * y)
                * jnp.sin(math.pi * z))

    errs = []
    for lvl in (3, 4, 5):
        n = 2 ** lvl
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              smoother="chebyshev", nu1=3, nu2=2,
                              dtype=jnp.float64)
        prob = Diffusion3DProblem(cfg, coefficient=a, forcing=forcing)
        res = solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-11,
                              max_cycles=60)
        assert bool(res.converged)
        from tpu_multigrid.problems.poisson3d import node_coordinates3
        x, y, z = node_coordinates3(n, prob.finest.grid_shape, jnp.float64)
        exact = (jnp.sin(math.pi * x) * jnp.sin(math.pi * y)
                 * jnp.sin(math.pi * z))
        err = (np.asarray(res.u) - np.asarray(exact))[1:n, 1:n, 1:n]
        errs.append(np.sqrt((err ** 2).mean()))
    assert errs[0] / errs[1] > 3.0
    assert errs[1] / errs[2] > 3.3


def test_convergence_mesh_independent_with_contrast():
    """Smooth 10:1 coefficient contrast: flat rho in depth."""
    def a(x, y, z):
        return 1.0 + 9.0 * x * y * z

    rhos = []
    for lvl in (3, 4, 5):
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              smoother="chebyshev", nu1=3, nu2=2,
                              dtype=jnp.float64)
        prob = Diffusion3DProblem(cfg, coefficient=a)
        res = solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-10,
                              max_cycles=40)
        h = np.asarray(res.res_history)
        it = int(res.iterations)
        rhos.append((h[it] / h[0]) ** (1.0 / it))
    assert max(rhos) < 0.30
    assert max(rhos) - min(rhos) < 0.12


def test_api_entry():
    cfg = MultigridConfig(finest_level=4, coarsest_level=2,
                          smoother="chebyshev", nu1=3, nu2=2,
                          dtype=jnp.float64)
    res = mg.solve_diffusion3d(4, coefficient=lambda x, y, z: 1.0 + x,
                               config=cfg, tol=1e-9)
    assert bool(res.converged)
    u = mg.extract_solution(res.u, 16)
    assert u.shape == (17, 17, 17)
    assert float(u[8, 8, 8]) > 0


def test_apply_matches_dense_assembly(rng):
    """The flux stencil equals a dense assembly built independently from
    the four-cell edge-transmissibility definition (random coefficients —
    the a=1 reduction cannot catch direction/sign errors)."""
    n, S, Sx = 4, 8, 128
    cells = np.exp(rng.standard_normal((n, n, n)))
    op = diffusion_op3_host(cells, n, S, Sx)

    def edge_t(P, Q):
        (z1, y1, x1), (z2, y2, x2) = P, Q
        vals = []
        if x1 != x2:
            xm = min(x1, x2)
            corners = [(cz, cy, xm) for cz in (z1 - 1, z1)
                       for cy in (y1 - 1, y1)]
        elif y1 != y2:
            ym = min(y1, y2)
            corners = [(cz, ym, cx) for cz in (z1 - 1, z1)
                       for cx in (x1 - 1, x1)]
        else:
            zm = min(z1, z2)
            corners = [(zm, cy, cx) for cy in (y1 - 1, y1)
                       for cx in (x1 - 1, x1)]
        for c in corners:
            ok = all(0 <= v < n for v in c)
            vals.append(cells[c] if ok else 0.0)
        return sum(vals) / 4.0

    m1 = n - 1
    m = m1 ** 3
    nodes = [(z, y, x) for z in range(1, n) for y in range(1, n)
             for x in range(1, n)]
    index = {p: i for i, p in enumerate(nodes)}
    A = np.zeros((m, m))
    for P, r in index.items():
        z, y, x = P
        diag = 0.0
        for dz, dy, dx in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                           (0, 0, 1), (0, 0, -1)):
            Q = (z + dz, y + dy, x + dx)
            t = edge_t(P, Q)
            diag += t
            if Q in index:
                A[r, index[Q]] -= t
        A[r, r] = diag

    u = np.zeros((S, S, Sx))
    u[1:n, 1:n, 1:n] = rng.standard_normal((m1,) * 3)
    got = np.asarray(op.apply(jnp.asarray(u)))[1:n, 1:n, 1:n].ravel()
    want = A @ u[1:n, 1:n, 1:n].ravel()
    np.testing.assert_allclose(got, want, atol=1e-12)

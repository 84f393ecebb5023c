"""3D mixed Dirichlet/Neumann boundary conditions (problems/mixedbc3d.py).

Mirrors tests/test_mixedbc.py one dimension up: dense ghost-reflection
oracle parity, SPD, dense-solve agreement, bounded V-cycle factors on the
rediscretized FV hierarchy, O(h^2) manufactured order, exactness on
separable quadratics (inhomogeneous g end-to-end), API guards.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid import MixedBC3DPoissonProblem, MultigridConfig
from tpu_multigrid.core import ops3d
from tpu_multigrid.cycles import solve_until_tol
from tpu_multigrid.problems.mixedbc3d import (SIDES3, _box_of3,
                                              mixed_poisson_op3,
                                              node_weights3)

f64 = jnp.float64


def _dense_oracle(n, neumann):
    """Independent dense assembly: ghost reflection + half-cell row
    scaling over the box unknowns (pure numpy, no framework code)."""
    neumann = frozenset(neumann)
    box = _box_of3(n, neumann)
    lo = (box[0], box[2], box[4])
    hi = (box[1], box[3], box[5])
    nodes = [(i, j, k)
             for i in range(lo[0], hi[0] + 1)
             for j in range(lo[1], hi[1] + 1)
             for k in range(lo[2], hi[2] + 1)]
    idx = {p: t for t, p in enumerate(nodes)}
    m = len(nodes)
    A = np.zeros((m, m))
    side_of = {0: ("zlo", "zhi"), 1: ("ylo", "yhi"), 2: ("xlo", "xhi")}
    for p, t in idx.items():
        row = {p: 6.0}
        for ax in range(3):
            for d in (-1, 1):
                q = list(p)
                q[ax] += d
                q = tuple(q)
                slo, shi = side_of[ax]
                on_lo = p[ax] == 0 and slo in neumann
                on_hi = p[ax] == n and shi in neumann
                if (d < 0 and on_lo) or (d > 0 and on_hi):
                    # ghost: reflect onto the inward neighbor
                    q = list(p)
                    q[ax] -= d
                    q = tuple(q)
                row[q] = row.get(q, 0.0) - 1.0
        w = 1.0
        for ax in range(3):
            slo, shi = side_of[ax]
            if (p[ax] == 0 and slo in neumann) or \
                    (p[ax] == n and shi in neumann):
                w *= 0.5
        for q, v in row.items():
            if q in idx:
                A[t, idx[q]] += v * w
    return A, nodes, box


def _dense_from_op(op):
    """Columns of the operator over its box unknowns via basis probing."""
    from tpu_multigrid.core.grids import _unknown_slices
    inter = _unknown_slices(op)
    shp = tuple(s.stop - s.start for s in inter)
    m = int(np.prod(shp))
    eye = jnp.eye(m, dtype=f64).reshape((m,) + shp)
    grids = jnp.zeros((m,) + op.grid_shape, f64)
    grids = grids.at[(slice(None),) + inter].set(eye)
    cols = jax.vmap(op.apply)(grids)[(slice(None),) + inter]
    return np.asarray(cols.reshape(m, m)).T


@pytest.mark.parametrize("neumann", [("xlo",), ("zlo", "zhi"),
                                     ("xlo", "ylo", "zlo"),
                                     ("xlo", "xhi", "ylo", "yhi", "zlo")])
def test_apply_matches_dense_oracle(neumann):
    n = 8
    op = mixed_poisson_op3(n, n + 1, n + 1, neumann, dtype=np.float64)
    got = _dense_from_op(op)
    want, _, _ = _dense_oracle(n, neumann)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-13)


def test_operator_spd():
    n = 8
    op = mixed_poisson_op3(n, n + 1, n + 1, ("xlo", "yhi"),
                           dtype=np.float64)
    A = _dense_from_op(op)
    np.testing.assert_allclose(A, A.T, atol=1e-13)
    w = np.linalg.eigvalsh(A)
    assert w.min() > 1e-6, w.min()


def test_all_neumann_rejected():
    with pytest.raises(ValueError, match="singular"):
        mixed_poisson_op3(8, 9, 9, SIDES3)
    with pytest.raises(ValueError, match="unknown sides"):
        mixed_poisson_op3(8, 9, 9, ("front",))


def test_matches_dense_solve():
    """MG solution == dense solve of the same system (f64, n=8)."""
    cfg = MultigridConfig(finest_level=3, coarsest_level=2,
                          smoother="chebyshev", nu1=3, nu2=2, dtype=f64)
    neumann = ("xlo", "zhi")
    prob = MixedBC3DPoissonProblem(cfg, neumann=neumann, forcing=6.0,
                                   neumann_value=1.0)
    b = prob.rhs()
    res = solve_until_tol(prob.hierarchy, cfg, b, tol=1e-12,
                          max_cycles=60)
    A, nodes, box = _dense_oracle(8, neumann)
    rhs = np.asarray(b)[tuple(np.array(nodes).T)]
    want = np.linalg.solve(A, rhs)
    got = np.asarray(res.u)[tuple(np.array(nodes).T)]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)


@pytest.mark.parametrize("neumann", [("xlo",), ("zlo", "yhi")])
def test_convergence_factor_bounded(neumann):
    """Rediscretized-FV hierarchy: the V(3,2) factor stays bounded over
    levels (module docstring: no closed-form 27-point Galerkin in 3D;
    tests pin the redisc factor instead of mesh-exact flatness)."""
    factors = []
    for lvl in (3, 4, 5):
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              smoother="chebyshev", nu1=3, nu2=2,
                              dtype=f64)
        prob = MixedBC3DPoissonProblem(cfg, neumann=neumann)
        res = solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-10,
                              max_cycles=40)
        h = np.asarray(res.res_history)
        h = h[np.isfinite(h) & (h > 0)]
        rho = (h[-1] / h[1]) ** (1.0 / (len(h) - 2))
        factors.append(rho)
    assert max(factors) < 0.35, factors


def test_manufactured_homogeneous_neumann_order():
    """u = cos(pi x) sin(pi y) sin(pi z), du/dx = 0 at x in {0,1}: O(h^2)."""
    def forcing(x, y, z):
        return (3 * math.pi ** 2 * jnp.cos(math.pi * x)
                * jnp.sin(math.pi * y) * jnp.sin(math.pi * z))

    errs = []
    for lvl in (3, 4, 5):
        n = 2 ** lvl
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              smoother="chebyshev", nu1=3, nu2=2,
                              dtype=f64)
        prob = MixedBC3DPoissonProblem(cfg, neumann=("xlo", "xhi"),
                                       forcing=forcing)
        res = solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-11,
                              max_cycles=60)
        from tpu_multigrid.problems.poisson3d import node_coordinates3
        x, y, z = node_coordinates3(n, n + 1, f64)
        exact = ops3d.mask_box3(
            jnp.cos(math.pi * x) * jnp.sin(math.pi * y)
            * jnp.sin(math.pi * z), prob.finest.box)
        err = np.asarray(res.u - exact)
        errs.append(np.sqrt((err ** 2).mean()))
    assert errs[0] / errs[1] > 3.3, errs
    assert errs[1] / errs[2] > 3.3, errs


def test_manufactured_inhomogeneous_neumann_exact():
    """u = (x^2 + x) y(1-y) z(1-z): separable quadratics are differenced
    exactly and the ghost-reflection closure is exact for quadratics, so
    the discrete solution equals the manufactured one to solver tolerance
    (exercises the 2hg RHS terms and their row scaling end-to-end)."""
    def forcing(x, y, z):
        return (-2.0 * y * (1 - y) * z * (1 - z)
                + 2.0 * (x * x + x) * z * (1 - z)
                + 2.0 * (x * x + x) * y * (1 - y))

    def g(x, y, z):
        # xlo (x=0): -(2x+1)|0 = -1; xhi (x=1): +(2x+1)|1 = 3
        return jnp.where(x < 0.5, -1.0, 3.0) * y * (1 - y) * z * (1 - z)

    for lvl in (3, 4):
        n = 2 ** lvl
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              smoother="chebyshev", nu1=3, nu2=2,
                              dtype=f64)
        prob = MixedBC3DPoissonProblem(cfg, neumann=("xlo", "xhi"),
                                       forcing=forcing, neumann_value=g)
        res = solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-12,
                              max_cycles=60)
        from tpu_multigrid.problems.poisson3d import node_coordinates3
        x, y, z = node_coordinates3(n, n + 1, f64)
        exact = ops3d.mask_box3((x * x + x) * y * (1 - y) * z * (1 - z),
                                prob.finest.box)
        err = np.asarray(res.u - exact)
        assert np.sqrt((err ** 2).mean()) < 1e-11, lvl


def test_api_entry_and_guards():
    import tpu_multigrid as mg
    cfg = MultigridConfig(finest_level=3, coarsest_level=2, dtype=f64)
    res = mg.solve_poisson3d(3, config=cfg, neumann=("zlo",), tol=1e-9)
    assert res.converged
    # zlo face carries live (unknown) values
    assert float(jnp.abs(res.u[0, 1:8, 1:8]).max()) > 0
    with pytest.raises(ValueError, match="neumann"):
        mg.solve_poisson3d(3, config=cfg, neumann=("zlo",), boundary=1.0)
    with pytest.raises(ValueError, match="neumann"):
        mg.solve_poisson3d(3, config=cfg, neumann=("zlo",), refined=True)
    with pytest.raises(ValueError, match="neumann"):
        mg.solve_poisson3d(3, config=cfg, neumann=("zlo",), use_fmg=True)


@pytest.mark.parametrize("neumann", [("xlo",), ("zlo", "yhi"),
                                     ("zhi", "yhi", "xhi")])
def test_box_transfers_adjoint(neumann):
    """R = P^T/2 on boxes to roundoff — the load-bearing property behind
    the flat rediscretized factors (a decimation that dropped fine plane
    n broke this for hi-side boxes and sent rho drifting to 0.77)."""
    nf, nc, Sf, Sc = 16, 8, 17, 9
    fbox = _box_of3(nf, frozenset(neumann))
    cbox = _box_of3(nc, frozenset(neumann))
    rng = np.random.default_rng(0)
    rf = np.zeros((Sf,) * 3)
    ec = np.zeros((Sc,) * 3)
    mf = np.asarray(ops3d.box_mask3((Sf,) * 3, fbox))
    mc = np.asarray(ops3d.box_mask3((Sc,) * 3, cbox))
    rf[mf] = rng.standard_normal(int(mf.sum()))
    ec[mc] = rng.standard_normal(int(mc.sum()))
    R = np.asarray(ops3d.restrict_fw3(jnp.asarray(rf), nf, Sc, box=cbox))
    P = np.asarray(ops3d.prolong3(jnp.asarray(ec), nc, Sf, box=fbox))
    lhs = (R * ec).sum()
    rhs = 0.5 * (rf * P).sum()
    assert abs(lhs - rhs) <= 1e-13 * abs(rhs), (lhs, rhs)

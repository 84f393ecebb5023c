"""3D rotated anisotropic tensors (problems/anisotropic3d.Rotated3DOp;
VERDICT r3 next #7): closed-form operator oracle, manufactured-solution
O(h^2), h-independent rates at a usable rotation, API entry."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.core import ops
from tpu_multigrid.cycles import solve_fixed, solve_until_tol
from tpu_multigrid.problems.anisotropic3d import (Rotated3DOp,
                                                  RotatedAnisotropic3DProblem,
                                                  rotation_tensor3)


def test_rotation_tensor_is_spd_similarity():
    K = rotation_tensor3(1.0, 0.1, 0.5, math.radians(30), "xz")
    Kn = np.asarray(K)
    np.testing.assert_allclose(Kn, Kn.T, atol=1e-15)
    w = np.linalg.eigvalsh(Kn)
    np.testing.assert_allclose(sorted(w), [0.1, 0.5, 1.0], atol=1e-12)


def test_rotated3_apply_matches_closed_form(rng):
    n, S = 6, 7
    K = rotation_tensor3(1.0, 0.2, 0.6, math.radians(25), "xy")
    K = np.asarray(K)
    op = Rotated3DOp(n, S, K)
    u = np.zeros((S, S, S))
    u[1:n, 1:n, 1:n] = rng.standard_normal((n - 1, n - 1, n - 1))
    got = np.asarray(op.apply(jnp.asarray(u)))
    # direct 19-point evaluation: grid axes (z, y, x) carry K indices
    # (2, 1, 0)
    want = np.zeros_like(u)
    ax_of = {0: 2, 1: 1, 2: 0}
    for i in range(1, n):
        for j in range(1, n):
            for k in range(1, n):
                v = 2.0 * (K[0, 0] + K[1, 1] + K[2, 2]) * u[i, j, k]
                for d, kd in ((0, K[0, 0]), (1, K[1, 1]), (2, K[2, 2])):
                    e = [0, 0, 0]
                    e[ax_of[d]] = 1
                    v -= kd * (u[i + e[0], j + e[1], k + e[2]]
                               + u[i - e[0], j - e[1], k - e[2]])
                for a in range(3):
                    for b in range(a + 1, 3):
                        kab = K[a, b]
                        if kab == 0.0:
                            continue
                        ea = [0, 0, 0]
                        eb = [0, 0, 0]
                        ea[ax_of[a]] = 1
                        eb[ax_of[b]] = 1
                        pp = u[i + ea[0] + eb[0], j + ea[1] + eb[1],
                               k + ea[2] + eb[2]]
                        mm = u[i - ea[0] - eb[0], j - ea[1] - eb[1],
                               k - ea[2] - eb[2]]
                        pm = u[i + ea[0] - eb[0], j + ea[1] - eb[1],
                               k + ea[2] - eb[2]]
                        mp = u[i - ea[0] + eb[0], j - ea[1] + eb[1],
                               k - ea[2] + eb[2]]
                        v += -0.5 * kab * (pp + mm) + 0.5 * kab * (pm + mp)
                want[i, j, k] = v
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_rotated3_reduces_to_poisson_at_identity(rng):
    from tpu_multigrid.core.operators import ConstStencilOp3D
    n, S = 8, 9
    op = Rotated3DOp(n, S, np.eye(3))
    pop = ConstStencilOp3D(n, S)
    u = np.zeros((S, S, S))
    u[1:n, 1:n, 1:n] = rng.standard_normal((n - 1, n - 1, n - 1))
    u = jnp.asarray(u)
    np.testing.assert_allclose(np.asarray(op.apply(u)),
                               np.asarray(pop.apply(u)), atol=1e-12)


def test_rotated3_manufactured_solution_order():
    """u* = sin(pi x) sin(pi y) sin(pi z):
    f = pi^2 (Kxx + Kyy + Kzz) u* - cross terms; with this separable u*,
    u_ab = pi^2 cos(a) cos(b) ... — compute f symbolically."""
    ang = math.radians(30)
    K = np.asarray(rotation_tensor3(1.0, 0.25, 0.5, ang, "xy"))

    def forcing(x, y, z):
        sx, sy, sz = (jnp.sin(math.pi * v) for v in (x, y, z))
        cx, cy, cz = (jnp.cos(math.pi * v) for v in (x, y, z))
        pi2 = math.pi ** 2
        f = pi2 * (K[0, 0] + K[1, 1] + K[2, 2]) * sx * sy * sz
        f = f - 2 * K[0, 1] * pi2 * cx * cy * sz
        f = f - 2 * K[0, 2] * pi2 * cx * sy * cz
        f = f - 2 * K[1, 2] * pi2 * sx * cy * cz
        return f

    errs = []
    for lvl in (3, 4, 5):
        n = 2 ** lvl
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              dtype=jnp.float64, smoother="rbgs",
                              nu1=2, nu2=2, cycle="W")
        prob = RotatedAnisotropic3DProblem(cfg, eps_x=1.0, eps_y=0.25,
                                           eps_z=0.5, angle=ang,
                                           forcing=forcing)
        res = solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-11,
                              max_cycles=80)
        assert bool(res.converged)
        x = np.arange(n + 1) / n
        s1 = np.sin(math.pi * x)
        want = s1[:, None, None] * s1[None, :, None] * s1[None, None, :]
        got = np.asarray(res.u)[: n + 1, : n + 1, : n + 1]
        errs.append(np.abs(got - want).max())
    assert errs[0] / errs[1] == pytest.approx(4.0, rel=0.25)
    assert errs[1] / errs[2] == pytest.approx(4.0, rel=0.25)


@pytest.mark.slow
def test_rotated3_h_independent_usable_rate():
    """10:1 anisotropy rotated 30 deg in xz: W-cycle rbgs rates stay
    usable (< 0.6) and mesh-independent — the 2D rotated family's bar
    (test_anisotropic.TestRotated.test_45deg_usable_rate)."""
    rates = []
    for lvl in (4, 5):
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=2,
                              dtype=jnp.float64, smoother="rbgs",
                              nu1=2, nu2=2, cycle="W")
        prob = RotatedAnisotropic3DProblem(
            cfg, eps_x=1.0, eps_y=1.0, eps_z=0.1,
            angle=math.radians(30), plane="xz")
        res = solve_fixed(prob.hierarchy, cfg, prob.rhs(), 8)
        h = np.asarray(res.res_history)
        rates.append((h[8] / h[5]) ** (1 / 3))
    assert all(r < 0.6 for r in rates), rates
    assert abs(rates[0] - rates[1]) < 0.15, rates


def test_solve_anisotropic3d_angle_api():
    cfg = MultigridConfig(finest_level=4, coarsest_level=2,
                          dtype=jnp.float64, smoother="rbgs",
                          nu1=2, nu2=2, cycle="W")
    res = mg.solve_anisotropic3d(4, eps_x=1.0, eps_y=0.2, eps_z=0.5,
                                 angle=math.radians(20), plane="yz",
                                 config=cfg, tol=1e-9, max_cycles=60)
    assert bool(res.converged)
    assert np.isfinite(np.asarray(res.u)).all()

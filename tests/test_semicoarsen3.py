"""3D semi-coarsened multigrid (core/semicoarsen3.py): closed-form
constant-stencil Galerkin exactness, coupling-balanced axis choice,
robustness at strong axis-aligned anisotropy where full coarsening with
point smoothers degrades, and the solve_anisotropic3d API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.core import semicoarsen3 as S3
from tpu_multigrid.cycles import solve_fixed


def _dense_transfers(op, opc):
    """(P, R) dense realizations of the coarse level's transfer pair."""
    mz, my, mx = op.nz - 1, op.ny - 1, op.nx - 1
    mzc, myc, mxc = opc.nz - 1, opc.ny - 1, opc.nx - 1
    mf, mc = mz * my * mx, mzc * myc * mxc
    P = np.zeros((mf, mc))
    for J in range(mc):
        e = np.zeros((opc.Sz, opc.Sy, opc.Sx), np.float32)
        iz, iy, ix = np.unravel_index(J, (mzc, myc, mxc))
        e[1 + iz, 1 + iy, 1 + ix] = 1.0
        z = jnp.zeros(op.grid_shape, jnp.float32)
        f = np.asarray(opc.prolong_add_into(z, jnp.asarray(e), op))
        P[:, J] = f[1:op.nz, 1:op.ny, 1:op.nx].ravel()
    R = np.zeros((mc, mf))
    for I in range(mf):
        e = np.zeros(op.grid_shape, np.float32)
        iz, iy, ix = np.unravel_index(I, (mz, my, mx))
        e[1 + iz, 1 + iy, 1 + ix] = 1.0
        r = np.asarray(opc.restrict_into(jnp.asarray(e), op))
        R[:, I] = r[1:opc.nz, 1:opc.ny, 1:opc.nx].ravel()
    return P, R


class TestGalerkin:
    @pytest.mark.parametrize("axes", [("z",), ("y",), ("x",),
                                      ("z", "y", "x")])
    def test_closed_form_is_exact_galerkin(self, axes):
        """dense(R) == dense(P)^T and P^T A P == closed-form coarse —
        the constant-stencil-with-mask design is exactly variational."""
        op = S3.semi_anisotropic_op3(4, 2.0, 1.0, 50.0)
        opc = S3.galerkin_semicoarsen3(op, axes)
        P, R = _dense_transfers(op, opc)
        np.testing.assert_allclose(R, P.T, atol=1e-12)
        A = op.dense_matrix()
        np.testing.assert_allclose(P.T @ A @ P, opc.dense_matrix(),
                                   atol=1e-10)

    def test_coarse_stencil_invariants(self):
        """The Galerkin coarse stencil (27-point after trilinear R A P)
        annihilates constants (zero row sum: A_c 1 = P^T A P 1 = 0 away
        from the boundary) and keeps the operator symmetric (negation
        symmetry of offsets)."""
        op = S3.semi_anisotropic_op3(8, 2.0, 1.0, 50.0)
        for axes in [("z",), ("z", "y", "x")]:
            s = S3.galerkin_semicoarsen3(op, axes).sten
            assert abs(s.sum()) < 1e-12 * abs(s[1, 1, 1])
            np.testing.assert_allclose(s, s[::-1, ::-1, ::-1], atol=1e-14)
            assert s[1, 1, 1] > 0


class TestAxisChoice:
    def test_coupling_balance_rule(self):
        pick = S3.choose_coarsen_axes3
        assert set(pick(1, 1, 1, 32, 32, 32)) == {"x", "y", "z"}
        assert pick(1, 1, 100, 32, 32, 32) == ("z",)
        assert set(pick(100, 1, 100, 32, 32, 32)) == {"z", "x"}
        # the strong axis equilibrates as its h doubles: at n_z = 4 the
        # couplings balance (100*16 ~ 1*1024) -> full coarsening resumes
        assert set(pick(1, 1, 100, 32, 32, 4)) == {"x", "y", "z"}
        # an axis at extent 2 carries no modes and leaves the comparison
        assert pick(1, 1, 100, 32, 32, 2)[0] in ("y", "x")

    def test_hierarchy_semicoarsens_strong_axis_first(self):
        hier = S3.build_semicoarsened_hierarchy3(
            MultigridConfig(finest_level=5, coarsest_level=3),
            1.0, 1.0, 100.0)
        assert hier.levels[1].from_axes == ("z",)
        assert hier.levels[1].ny == hier.levels[0].ny  # y untouched
        assert hier.levels[1].nz == hier.levels[0].nz // 2


class TestRobustness:
    def _rho(self, hier, cycles=8):
        cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                              smoother="chebyshev", nu1=2, nu2=1)
        op = hier.levels[0]
        rng = np.random.default_rng(0)
        b = np.zeros(op.grid_shape, np.float32)
        b[1:op.nz, 1:op.ny, 1:op.nx] = rng.standard_normal(
            (op.nz - 1, op.ny - 1, op.nx - 1)).astype(np.float32)
        res = solve_fixed(hier, cfg, jnp.asarray(b), num_cycles=cycles)
        h = np.asarray(res.res_history)
        return (h[cycles] / h[2]) ** (1.0 / (cycles - 2))

    def test_semi_beats_full_at_strong_anisotropy(self):
        """Point smoothing on FULL coarsening degrades at 100:1; the
        coupling-balanced semi hierarchy stays fast."""
        cfg = MultigridConfig(finest_level=5, coarsest_level=3)
        semi = S3.build_semicoarsened_hierarchy3(cfg, 1.0, 1.0, 100.0)
        full = S3.build_semicoarsened_hierarchy3(cfg, 1.0, 1.0, 100.0,
                                                 balance=1e30)
        assert all(lv.from_axes == ("z", "y", "x")
                   for lv in full.levels[1:])
        r_semi, r_full = self._rho(semi), self._rho(full)
        assert r_semi < 0.35, r_semi
        assert r_full > 0.6, r_full
        assert r_semi < 0.6 * r_full

    def test_h_independent_rate(self):
        rhos = []
        for lvl in (4, 5):
            cfg = MultigridConfig(finest_level=lvl, coarsest_level=3)
            hier = S3.build_semicoarsened_hierarchy3(cfg, 1.0, 1.0, 100.0)
            rhos.append(self._rho(hier, cycles=6))
        assert rhos[1] < rhos[0] + 0.12, rhos


class TestAPI:
    def test_solve_converges_all_axes(self):
        for eps in [(1, 1, 100), (100, 1, 1), (1, 100, 1), (50, 1, 0.02)]:
            r = mg.solve_anisotropic3d(5, eps_x=eps[0], eps_y=eps[1],
                                       eps_z=eps[2], num_cycles=8,
                                       tol=None)
            h = np.asarray(r.res_history)
            h = h[~np.isnan(h)]
            assert h[-1] < 1e-4 * h[0], (eps, h)

    def test_manufactured_solution_o_h2(self):
        """u = sin(pi x) sin(pi y) sin(pi z), f = (ex+ey+ez) pi^2 u:
        nodal error halves O(h^2) per refinement through the semi path."""
        ex, ey, ez = 1.0, 1.0, 20.0

        def f(x, y, z):
            return ((ex + ey + ez) * np.pi ** 2
                    * jnp.sin(np.pi * x) * jnp.sin(np.pi * y)
                    * jnp.sin(np.pi * z))

        errs = []
        for lvl in (3, 4, 5):
            r = mg.solve_anisotropic3d(lvl, eps_x=ex, eps_y=ey, eps_z=ez,
                                       forcing=f, num_cycles=25, tol=None)
            n = 2 ** lvl
            u = np.asarray(r.u)[:n + 1, :n + 1, :n + 1]
            g = np.arange(n + 1) / n
            exact = (np.sin(np.pi * g)[:, None, None]
                     * np.sin(np.pi * g)[None, :, None]
                     * np.sin(np.pi * g)[None, None, :])
            errs.append(np.max(np.abs(u - exact)))
        assert errs[0] / errs[1] > 3.3, errs
        assert errs[1] / errs[2] > 3.3, errs

    def test_zebra_rejected(self):
        cfg = MultigridConfig(finest_level=4, coarsest_level=3,
                              smoother="zebra_x")
        with pytest.raises(ValueError):
            mg.solve_anisotropic3d(4, eps_z=100.0, config=cfg)

"""Operator-general distributed solves (shard_cycle's ``operator=``
factory): anisotropic / rotated tensors, Helmholtz shifts, and
NONSYMMETRIC upwind convection through the sharded 9-plane path.

Plain-jnp shard_map at 8 virtual devices (safe on this host, CLAUDE.md).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.dist.mesh import make_grid_mesh
from tpu_multigrid.dist.shard_cycle import sharded_solve
from tpu_multigrid.problems.anisotropic import anisotropic_poisson_op
from tpu_multigrid.problems.convection import convection_diffusion_op

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _solve(mesh_shape, ndev, operator, coarsening, smoother="chebyshev",
           nu=(3, 2), cycles=5):
    cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                          smoother=smoother, nu1=nu[0], nu2=nu[1],
                          mesh_shape=mesh_shape)
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[:ndev])
    res, levels = sharded_solve(cfg, mesh, operator=operator,
                                operator_coarsening=coarsening,
                                num_cycles=cycles, tol=0.0,
                                replicate_below=8)
    return np.asarray(res.res_history), levels


class TestParity:
    @pytest.mark.parametrize("factory,coarsening,smoother", [
        (lambda n, S: anisotropic_poisson_op(n, S, 10.0, 1.0,
                                             dtype=np.float32),
         "galerkin", "chebyshev"),
        (lambda n, S: anisotropic_poisson_op(
            n, S, 1.0, 0.05, angle=math.radians(30), dtype=np.float32),
         "galerkin", "chebyshev"),
        (lambda n, S: convection_diffusion_op(n, S, 0.01, 1.0, 0.5,
                                              dtype=np.float32),
         "rediscretize", "rbgs"),
    ])
    def test_1_vs_4(self, factory, coarsening, smoother):
        h1, l1 = _solve((1, 1), 1, factory, coarsening, smoother)
        h4, l4 = _solve((2, 2), 4, factory, coarsening, smoother)
        assert l1.sizes == l4.sizes
        assert np.isfinite(h4).all()
        np.testing.assert_allclose(h4, h1, rtol=3e-4)


class TestZebraLines:
    """Distributed zebra line relaxation: lines stay shard-local on band
    meshes (zebra_x on (k, 1) rows, zebra_y on (1, k) columns)."""

    def test_zebra_x_1_vs_4_rowband(self):
        factory = lambda n, S: anisotropic_poisson_op(n, S, 1.0, 0.01,
                                                      dtype=np.float32)
        h1, l1 = _solve((1, 1), 1, factory, "galerkin", "zebra_x",
                        nu=(1, 1))
        h4, l4 = _solve((4, 1), 4, factory, "galerkin", "zebra_x",
                        nu=(1, 1))
        assert l1.sizes == l4.sizes
        assert np.isfinite(h4).all()
        np.testing.assert_allclose(h4, h1, rtol=3e-4)
        # strong-anisotropy robustness: line relaxation actually contracts
        assert h4[-1] < 1e-4 * h4[0], h4

    def test_zebra_y_1_vs_4_colband(self):
        factory = lambda n, S: anisotropic_poisson_op(n, S, 0.01, 1.0,
                                                      dtype=np.float32)
        h1, _ = _solve((1, 1), 1, factory, "galerkin", "zebra_y",
                       nu=(1, 1))
        h4, _ = _solve((1, 4), 4, factory, "galerkin", "zebra_y",
                       nu=(1, 1))
        assert np.isfinite(h4).all()
        np.testing.assert_allclose(h4, h1, rtol=3e-4)
        assert h4[-1] < 1e-4 * h4[0], h4

    def test_zebra_api_rowband_mesh(self):
        mesh = make_grid_mesh(shape=(4, 1), devices=jax.devices()[:4])
        cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                              smoother="zebra_x", nu1=1, nu2=1,
                              mesh_shape=(4, 1))
        r = mg.solve_anisotropic(6, eps_x=1.0, eps_y=0.01,
                                 coarsening="full", config=cfg, mesh=mesh,
                                 num_cycles=6, tol=0.0)
        h = np.asarray(r.res_history)
        assert h[6] < 1e-4 * h[0], h

    def test_zebra_on_2d_mesh_runs_cross_shard(self):
        # r3 rejected line smoothing on genuinely-2D meshes; r4's tiled
        # all_to_all zebra (dist/local_var.var_zebra_alltoall) removed
        # the restriction — the solve must now run and converge (slowly
        # here: zebra_y against eps_x >> eps_y is the wrong orientation,
        # which the library accepts like the single-chip path does).
        mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
        cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                              smoother="zebra_y", mesh_shape=(2, 2))
        r = mg.solve_anisotropic(5, eps_x=100.0, config=cfg, mesh=mesh,
                                 num_cycles=6, tol=0.0)
        h = np.asarray(r.res_history)
        assert np.isfinite(h[6]) and h[6] < 0.2 * h[0], h


class TestAPI:
    def test_distributed_family_solves_converge(self):
        mesh = make_grid_mesh(shape=(2, 4), devices=jax.devices()[:8])
        cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                              smoother="chebyshev", nu1=3, nu2=2,
                              mesh_shape=(2, 4))
        r = mg.solve_anisotropic(6, eps_x=1.0, eps_y=0.05,
                                 angle=math.radians(30), config=cfg,
                                 mesh=mesh, num_cycles=8, tol=0.0)
        h = np.asarray(r.res_history)
        assert h[8] < 1e-3 * h[0], h

        ccfg = MultigridConfig(finest_level=6, coarsest_level=3,
                               smoother="rbgs", nu1=2, nu2=2,
                               mesh_shape=(2, 4))
        r = mg.solve_convection_diffusion(6, eps=0.01, bx=1.0, by=0.5,
                                          config=ccfg, mesh=mesh,
                                          num_cycles=6, tol=0.0)
        h = np.asarray(r.res_history)
        assert h[6] < 1e-3 * h[0], h

        r = mg.solve_helmholtz(6, shift=lambda x, y: 10.0 * x, config=cfg,
                               mesh=mesh, num_cycles=6, tol=0.0)
        h = np.asarray(r.res_history)
        assert h[6] < 1e-3 * h[0], h

    def test_incompatible_mesh_options_rejected(self):
        # Former rejections that became r4 features are asserted as
        # behavior elsewhere (cross-shard zebra: TestZebraLines +
        # test_dist_zebra_alltoall; semi+mesh: test_dist_semicoarsen).
        # Boundary lifting on mesh= remains explicitly rejected.
        mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
        cfg2 = MultigridConfig(finest_level=5, coarsest_level=3,
                               mesh_shape=(2, 2))
        with pytest.raises(ValueError):
            mg.solve_convection_diffusion(5, bx=1.0, boundary=1.0,
                                          config=cfg2, mesh=mesh)

    def test_operator_and_coefficient_mutually_exclusive(self):
        from tpu_multigrid.dist.shard_cycle import build_sharded_problem
        mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
        cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                              mesh_shape=(2, 2))
        with pytest.raises(ValueError):
            build_sharded_problem(
                cfg, mesh, coefficient=1.0,
                operator=lambda n, S: anisotropic_poisson_op(n, S))

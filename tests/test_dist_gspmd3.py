"""3D families on the generic GSPMD distribution vehicle
(dist.mesh.gspmd_solve_hierarchy with grid_ndim=3): semi-coarsened
anisotropic 3D, rotated 19-point tensors, and upwind convection 3D
shard (Sz, Sy) over the 2D device mesh while Sx lanes stay whole."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.dist.mesh import make_grid_mesh


def _traj_match(res, ref, rtol_shallow=2e-3, rtol_deep=0.2):
    h = np.asarray(res.res_history)
    hr = np.asarray(ref.res_history)
    shallow = hr / hr[0] >= 1e-3
    np.testing.assert_allclose((h / h[0])[shallow], (hr / hr[0])[shallow],
                               rtol=rtol_shallow)
    np.testing.assert_allclose((h / h[0])[~shallow],
                               (hr / hr[0])[~shallow], rtol=rtol_deep)


@pytest.mark.parametrize("mesh_shape", [(2, 2), (4, 2)])
def test_semicoarsen3_gspmd_matches_single_chip(mesh_shape):
    my, mx = mesh_shape
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float32, smoother="chebyshev",
                          nu1=3, nu2=2)
    mesh = make_grid_mesh(shape=mesh_shape,
                          devices=jax.devices()[: my * mx])
    kw = dict(eps_x=1.0, eps_y=1.0, eps_z=100.0, config=cfg,
              num_cycles=5, tol=None)
    res = mg.solve_anisotropic3d(5, mesh=mesh, **kw)
    ref = mg.solve_anisotropic3d(5, **kw)
    _traj_match(res, ref)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-7)


def test_rotated3d_gspmd_matches_single_chip():
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float32, smoother="rbgs", nu1=2,
                          nu2=2, cycle="W")
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    kw = dict(eps_x=1.0, eps_y=0.2, eps_z=1.0,
              angle=math.radians(30.0), plane="xy", config=cfg,
              num_cycles=5, tol=None)
    res = mg.solve_anisotropic3d(5, mesh=mesh, **kw)
    ref = mg.solve_anisotropic3d(5, **kw)
    _traj_match(res, ref)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-7)


def test_convection3d_gspmd_matches_single_chip():
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float32, smoother="rbgs", nu1=2,
                          nu2=2)
    mesh = make_grid_mesh(shape=(2, 4), devices=jax.devices()[:8])
    kw = dict(eps=0.05, bx=1.0, by=0.5, bz=0.25, config=cfg,
              num_cycles=5, tol=None)
    res = mg.solve_convection_diffusion3d(5, mesh=mesh, **kw)
    ref = mg.solve_convection_diffusion3d(5, **kw)
    _traj_match(res, ref)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-7)


def test_semicoarsen3_gspmd_until_tol_converges():
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float64, smoother="chebyshev",
                          nu1=3, nu2=2)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    res = mg.solve_anisotropic3d(5, eps_x=1.0, eps_y=1.0, eps_z=100.0,
                                 config=cfg, mesh=mesh, tol=1e-9,
                                 max_cycles=40)
    assert bool(res.converged)
    h = np.asarray(res.res_history)
    h = h[np.isfinite(h)]
    assert (h[-1] / h[0]) ** (1.0 / (len(h) - 1)) < 0.35


def test_gspmd3_rejects_fmg():
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="use_fmg"):
        mg.solve_anisotropic3d(4, eps_z=100.0, mesh=mesh, use_fmg=True,
                               num_cycles=2, tol=None)

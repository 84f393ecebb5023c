"""Nonlinear (FAS) families on the generic GSPMD vehicle
(dist.mesh.gspmd_fas_solve_hierarchy): quasilinear flux diffusion (2D +
3D) and the 3D pointwise tier (Bratu) distribute by NamedSharding —
completes the FAS distribution story next to the explicit shard_map
pointwise 2D path (dist/fas.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.dist.mesh import make_grid_mesh


def _traj_match(res, ref):
    h = np.asarray(res.res_history)
    hr = np.asarray(ref.res_history)
    shallow = hr / hr[0] >= 1e-3
    np.testing.assert_allclose((h / h[0])[shallow], (hr / hr[0])[shallow],
                               rtol=2e-3)
    np.testing.assert_allclose((h / h[0])[~shallow],
                               (hr / hr[0])[~shallow], rtol=0.2)


def _cfg(level, **kw):
    return MultigridConfig(finest_level=level, coarsest_level=2,
                           dtype=jnp.float32, coarse_solver="smooth",
                           coarse_smooth_sweeps=40, **kw)


@pytest.mark.parametrize("mesh_shape", [(2, 2), (2, 4)])
def test_quasilinear2d_gspmd_matches_single_chip(mesh_shape):
    my, mx = mesh_shape
    mesh = make_grid_mesh(shape=mesh_shape,
                          devices=jax.devices()[: my * mx])
    kw = dict(gamma=2.0, config=_cfg(6), num_cycles=5, tol=None)
    res = mg.solve_quasilinear_diffusion(6, mesh=mesh, **kw)
    ref = mg.solve_quasilinear_diffusion(6, **kw)
    _traj_match(res, ref)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-7)


def test_quasilinear3d_gspmd_matches_single_chip():
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    kw = dict(gamma=1.0, ndim=3, config=_cfg(4), num_cycles=4, tol=None)
    res = mg.solve_quasilinear_diffusion(4, mesh=mesh, **kw)
    ref = mg.solve_quasilinear_diffusion(4, **kw)
    _traj_match(res, ref)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-7)


def test_bratu3d_gspmd_matches_single_chip():
    mesh = make_grid_mesh(shape=(2, 4), devices=jax.devices()[:8])
    cfg = MultigridConfig(finest_level=4, coarsest_level=2,
                          dtype=jnp.float32)
    kw = dict(lam=2.0, ndim=3, config=cfg, num_cycles=4, tol=None)
    res = mg.solve_bratu(4, mesh=mesh, **kw)
    ref = mg.solve_bratu(4, **kw)
    _traj_match(res, ref)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-7)


def test_quasilinear_gspmd_until_tol_converges():
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    res = mg.solve_quasilinear_diffusion(5, gamma=2.0, config=_cfg(5),
                                         mesh=mesh, tol=1e-5,
                                         max_cycles=40)
    assert bool(res.converged)


def test_fas_gspmd_rejects_fmg():
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="FMG"):
        mg.solve_quasilinear_diffusion(4, config=_cfg(4), mesh=mesh,
                                       use_fmg=True, num_cycles=2,
                                       tol=None)
    with pytest.raises(ValueError, match="FMG"):
        mg.solve_bratu(4, ndim=3, mesh=mesh, use_fmg=True, num_cycles=2,
                       tol=None)

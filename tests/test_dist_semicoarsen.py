"""Distributed semi-coarsened hierarchies via GSPMD
(dist.mesh.gspmd_solve_hierarchy; VERDICT r3 next #5): rectangular
per-level shapes distribute by letting XLA partition the plain jnp
semicoarsen operators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.dist.mesh import make_grid_mesh


@pytest.mark.parametrize("mesh_shape", [(4, 1), (2, 2)])
def test_semi_gspmd_matches_single_chip(mesh_shape):
    my, mx = mesh_shape
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32, smoother="chebyshev",
                          nu1=3, nu2=2)
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    res = mg.solve_anisotropic(6, eps_x=1.0, eps_y=1e-3,
                               coarsening="semi", config=cfg, mesh=mesh,
                               num_cycles=6, tol=None)
    ref = mg.solve_anisotropic(6, eps_x=1.0, eps_y=1e-3,
                               coarsening="semi", config=cfg,
                               num_cycles=6, tol=None)
    h = np.asarray(res.res_history)
    hr = np.asarray(ref.res_history)
    shallow = hr / hr[0] >= 1e-3
    np.testing.assert_allclose((h / h[0])[shallow], (hr / hr[0])[shallow],
                               rtol=2e-3)
    np.testing.assert_allclose((h / h[0])[~shallow],
                               (hr / hr[0])[~shallow], rtol=0.2)
    n = 64
    np.testing.assert_allclose(np.asarray(res.u)[: n + 1, : n + 1],
                               np.asarray(ref.u)[: n + 1, : n + 1],
                               rtol=1e-4, atol=1e-7)


def test_semi_gspmd_until_tol_strong_anisotropy_f64():
    """1000:1 anisotropy on a (2,4) mesh: point-smoothed semi-coarsening
    stays mesh-independent through the GSPMD distribution (f64)."""
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float64, smoother="chebyshev",
                          nu1=3, nu2=2)
    mesh = make_grid_mesh(shape=(2, 4), devices=jax.devices()[:8])
    res = mg.solve_anisotropic(6, eps_x=1.0, eps_y=1e-3,
                               coarsening="semi", config=cfg, mesh=mesh,
                               tol=1e-9, max_cycles=40)
    assert bool(res.converged)
    h = np.asarray(res.res_history)
    h = h[np.isfinite(h)]
    # healthy per-cycle contraction, not a crawl
    assert (h[-1] / h[0]) ** (1.0 / (len(h) - 1)) < 0.35

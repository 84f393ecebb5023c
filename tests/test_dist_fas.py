"""Distributed FAS nonlinear multigrid (dist/fas.py).

1-vs-N parity of the shard-local nonlinear ops (f64), end-to-end Bratu
parity against the single-chip FAS tier, API mesh= routing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.core.nonlinear import PointwiseNonlinearOp, inject_solution
from tpu_multigrid.core.operators import poisson_op
from tpu_multigrid.cycles.fas import fas_solve_fixed
from tpu_multigrid.dist import fas as DF
from tpu_multigrid.dist.fas import fas_sharded_solve
from tpu_multigrid.dist.mesh import make_grid_mesh, place
from tpu_multigrid.problems.bratu import BratuProblem

SPEC = P("gy", "gx")


def _shard_apply(mesh, fn, *arrays):
    f = shard_map(fn, mesh=mesh, in_specs=(SPEC,) * len(arrays),
                  out_specs=SPEC, check_vma=False)
    return jax.jit(f)(*(place(a, mesh) for a in arrays))


def _grids(n, S, rng, k, dtype=jnp.float64):
    outs = []
    for _ in range(k):
        a = np.zeros((S, S))
        a[1:n, 1:n] = rng.standard_normal((n - 1, n - 1)) * 0.3
        outs.append(jnp.asarray(a, dtype))
    return outs


@pytest.mark.parametrize("mesh_shape", [(2, 2), (1, 4)])
def test_local_nonlinear_ops_match_global(mesh_shape, rng):
    my, mx = mesh_shape
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    n, S = 60, 64
    lam = 2.0
    phi = lambda u: -lam * jnp.exp(u)
    op = PointwiseNonlinearOp(poisson_op(n, S), phi, phi)
    u, b = _grids(n, S, rng, 2)
    h2 = (1.0 / n) ** 2

    got_a = _shard_apply(mesh, lambda ul, bl: DF._n_apply_local(
        ul, phi, n, h2), u, b)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(op.apply(u)),
                               rtol=1e-12, atol=1e-13)
    got_r = _shard_apply(mesh, lambda ul, bl: DF._n_residual_local(
        ul, bl, phi, n, h2), u, b)
    np.testing.assert_allclose(np.asarray(got_r),
                               np.asarray(op.residual(u, b)),
                               rtol=1e-12, atol=1e-13)
    got_s = _shard_apply(mesh, lambda ul, bl: DF._jacobi_newton_local(
        ul, bl, phi, phi, n, h2, 2 / 3, 3), u, b)
    want_s = op.nsmooth(u, b, omega=2 / 3, sweeps=3)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-12, atol=1e-13)
    got_i = _shard_apply(mesh, lambda ul, bl: DF._inject_local(ul, n),
                         u, b)
    want_i = inject_solution(u, n, S // 2)
    np.testing.assert_allclose(np.asarray(got_i)[: S // 2, : S // 2],
                               np.asarray(want_i)[: S // 2, : S // 2],
                               rtol=1e-14, atol=0)


@pytest.mark.parametrize("mesh_shape", [(1, 1), (2, 2)])
def test_fas_sharded_matches_single_chip(mesh_shape):
    """Distributed Bratu == the single-chip FAS tier (f32 trajectories
    and solutions)."""
    lam = 4.0
    my, mx = mesh_shape
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    phi = lambda u: -lam * jnp.exp(u)
    res, levels = fas_sharded_solve(cfg, mesh, phi=phi, dphi=phi,
                                    forcing=0.0, num_cycles=6,
                                    replicate_below=8)
    assert levels.num_sharded >= 1
    prob = BratuProblem(cfg, lam=lam, forcing=0.0)
    ref = fas_solve_fixed(prob.hierarchy, cfg, prob.rhs(), 6)
    h = np.asarray(res.res_history)
    hr = np.asarray(ref.res_history)
    np.testing.assert_allclose(h[:-1] / h[0], hr[:-1] / hr[0], rtol=2e-3)
    # deepest entry: f32 roundoff is a larger fraction of the value
    np.testing.assert_allclose(h[-1] / h[0], hr[-1] / hr[0], rtol=0.1)
    n = 64
    np.testing.assert_allclose(np.asarray(res.u)[: n + 1, : n + 1],
                               np.asarray(ref.u)[: n + 1, : n + 1],
                               rtol=1e-4, atol=1e-7)


def test_api_mesh_bratu_and_nonlinear():
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    res = mg.solve_bratu(6, lam=3.0, config=cfg, mesh=mesh, tol=1e-4)
    assert bool(res.converged), np.asarray(res.res_history)
    u = np.asarray(res.u)
    assert u[1:64, 1:64].min() > 0 and np.isfinite(u).all()

    res2 = mg.solve_nonlinear_poisson(
        6, phi=lambda u: u ** 3, dphi=lambda u: 3 * u * u, config=cfg,
        mesh=mesh, forcing=10.0, tol=1e-4)
    assert bool(res2.converged), np.asarray(res2.res_history)

    # ndim=3 + mesh routes through the GSPMD FAS vehicle (r4;
    # tests/test_dist_fas_gspmd.py covers parity) — FMG stays rejected.
    with pytest.raises(ValueError, match="FMG"):
        mg.solve_bratu(4, ndim=3, mesh=mesh, use_fmg=True, num_cycles=2,
                       tol=None, config=MultigridConfig(
                           finest_level=4, coarsest_level=2))


def test_fas_sharded_until_tol_and_f64():
    """f64 distributed FAS reaches deep tolerance (oracle-grade path)."""
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float64)
    mesh = make_grid_mesh(shape=(2, 4), devices=jax.devices()[:8])
    lam = 5.0
    phi = lambda u: -lam * jnp.exp(u)
    res, _ = fas_sharded_solve(cfg, mesh, phi=phi, dphi=phi, forcing=0.0,
                               tol=1e-11, max_cycles=40,
                               replicate_below=8)
    assert bool(res.converged)
    h = np.asarray(res.res_history)
    h = h[np.isfinite(h)]
    assert h[-1] / h[0] <= 1e-11

"""Distributed variable-coefficient + sharded-FMG + unified-API tests
(VERDICT r2 items 3 and 4) on the virtual CPU mesh.

Plain-jnp shard_map is safe at 8 devices on this host (CLAUDE.md); no
Pallas interpret kernels are launched here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tpu_multigrid import MultigridConfig
from tpu_multigrid.core.operators import diffusion_op_host
from tpu_multigrid.dist import local_var as V
from tpu_multigrid.dist.mesh import make_grid_mesh, place
from tpu_multigrid.dist.shard_cycle import build_sharded_problem, sharded_solve

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _jump(x, y):
    return 1.0 + 10.0 * ((x > 0.5) & (y > 0.5))


def _forcing(x, y):
    return 4.0 + 2.0 * x * y


@pytest.mark.parametrize("mesh_shape", [(2, 4), (2, 2)])
def test_local_var_ops_match_global(mesh_shape, rng):
    """Shard-local 9-point var ops == the global VarStencilOp (f64)."""
    my, mx = mesh_shape
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    n, S = 60, 64
    op = diffusion_op_host(
        rng.uniform(0.5, 2.0, (n, n)), n, S)
    u = np.zeros((S, S)); b = np.zeros((S, S))
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    u, b = jnp.asarray(u), jnp.asarray(b)
    coef = jnp.asarray(op.coef)
    invd = jnp.asarray(op.inv_diag)
    opj = jax.device_put(op)

    from jax import shard_map
    spec = P("gy", "gx")
    cspec = P(None, None, "gy", "gx")

    cases = [
        ("apply", lambda ul, bl, cl, il: V.var_apply_local(ul, cl, n),
         opj.apply(u)),
        ("residual", lambda ul, bl, cl, il: V.var_residual_local(
            ul, bl, cl, n), opj.residual(u, b)),
        ("jacobi3", lambda ul, bl, cl, il: V.var_jacobi_local(
            ul, bl, cl, il, n, 2 / 3, 3),
         opj.smooth(u, b, smoother="jacobi", omega=2 / 3, sweeps=3)),
        ("rbgs2", lambda ul, bl, cl, il: V.var_rbgs_local(
            ul, bl, cl, il, n, 2),
         opj.smooth(u, b, smoother="rbgs", omega=2 / 3, sweeps=2)),
    ]
    csharded = jax.device_put(coef, jax.NamedSharding(mesh, cspec))
    for name, fn, want in cases:
        f = shard_map(fn, mesh=mesh, in_specs=(spec, spec, cspec, spec),
                      out_specs=spec, check_vma=False)
        got = jax.jit(f)(place(u, mesh), place(b, mesh), csharded,
                         place(invd, mesh))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-13, err_msg=name)


@pytest.mark.parametrize("mesh_shape", [(2, 2), (1, 4)])
def test_sharded_var_solve_matches_single_device(mesh_shape):
    """1-vs-N parity for the distributed variable-coefficient solve."""
    my, mx = mesh_shape
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    res, lv = sharded_solve(cfg, mesh, coefficient=_jump, forcing=_forcing,
                            num_cycles=6, tol=0.0, replicate_below=8)
    assert lv.num_sharded >= 1
    mesh1 = make_grid_mesh(shape=(1, 1), devices=jax.devices()[:1])
    ref, _ = sharded_solve(cfg, mesh1, coefficient=_jump, forcing=_forcing,
                           num_cycles=6, tol=0.0, replicate_below=8)
    np.testing.assert_allclose(np.asarray(res.res_history),
                               np.asarray(ref.res_history), rtol=2e-4)
    n = 64
    np.testing.assert_allclose(np.asarray(res.u)[: n + 1, : n + 1],
                               np.asarray(ref.u)[: n + 1, : n + 1],
                               rtol=1e-4, atol=1e-7)


def test_sharded_var_solve_converges():
    """Jump-coefficient convergence stays h-independent-ish on shards."""
    cfg = MultigridConfig(finest_level=7, coarsest_level=3,
                          dtype=jnp.float32)
    mesh = make_grid_mesh(shape=(2, 4), devices=jax.devices()[:8])
    res, lv = sharded_solve(cfg, mesh, coefficient=_jump, num_cycles=5,
                            tol=0.0, replicate_below=16)
    assert lv.num_sharded >= 2
    h = np.asarray(res.res_history)[:6]
    factors = h[1:] / h[:-1]
    assert np.all(factors < 0.35), factors


def test_sharded_var_hierarchy_matches_host_galerkin():
    """build_sharded_problem's var hierarchy == the host Galerkin chain."""
    from tpu_multigrid.core.operators import galerkin_coarsen_host

    cfg = MultigridConfig(finest_level=5, coarsest_level=3)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    rng = np.random.default_rng(3)
    cells = rng.uniform(0.5, 2.0, (32, 32)).astype(np.float32)
    levels, hier = build_sharded_problem(cfg, mesh, coefficient=cells,
                                         replicate_below=8)
    n0, S0 = levels.sizes[0]
    fine = diffusion_op_host(cells, n0, S0)
    np.testing.assert_allclose(np.asarray(hier.levels[0].coef),
                               np.asarray(fine.coef), rtol=1e-6)
    c1 = galerkin_coarsen_host(fine, levels.sizes[1][1])
    np.testing.assert_allclose(np.asarray(hier.levels[1].coef),
                               np.asarray(c1.coef), rtol=1e-6)


@pytest.mark.parametrize("coefficient", [None, _jump])
def test_sharded_fmg_matches_single_device(coefficient):
    """Distributed FMG (VERDICT r2 missing #2): 1-vs-N parity and the
    FMG-quality initial guess (first cycle already well below the zero
    start)."""
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    res, _ = sharded_solve(cfg, mesh, coefficient=coefficient, num_cycles=3,
                           tol=0.0, replicate_below=8, use_fmg=True)
    mesh1 = make_grid_mesh(shape=(1, 1), devices=jax.devices()[:1])
    ref, _ = sharded_solve(cfg, mesh1, coefficient=coefficient, num_cycles=3,
                           tol=0.0, replicate_below=8, use_fmg=True)
    # The 9-point Galerkin FMG chain amplifies f32 summation-order noise
    # between mesh shapes over successive cycles; compare with an
    # r0-scaled atol (late-cycle values sit ~150x below the start).
    got, want = np.asarray(res.res_history), np.asarray(ref.res_history)
    np.testing.assert_allclose(got, want, rtol=1e-3,
                               atol=3e-4 * float(want[0]))
    # FMG start beats the zero start's first residual by a large factor.
    res0, _ = sharded_solve(cfg, mesh, coefficient=coefficient, num_cycles=1,
                            tol=0.0, replicate_below=8)
    assert float(res.res_history[0]) < 0.1 * float(res0.res_history[0])


def test_sharded_fmg_matches_global_fmg():
    """Distributed FMG == the single-device cycles.fmg on the same padded
    hierarchy (restrict-RHS semantics, Poissons_SYCL.cpp:629-650)."""
    from tpu_multigrid.cycles import fmg, solve_fixed
    from tpu_multigrid.dist.shard_cycle import build_sharded_poisson

    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    mesh1 = make_grid_mesh(shape=(1, 1), devices=jax.devices()[:1])
    res, _ = sharded_solve(cfg, mesh1, num_cycles=2, tol=0.0,
                           replicate_below=8, use_fmg=True)
    _, hier = build_sharded_poisson(cfg, mesh1, replicate_below=8)
    n0, S0 = hier.levels[0].n, hier.levels[0].S
    b = np.zeros((S0, S0), np.float32)
    b[1:n0, 1:n0] = 4.0 * (1.0 / n0) ** 2
    b = jnp.asarray(b)
    u0 = fmg(hier, cfg, b)
    ref = solve_fixed(hier, cfg, b, 2, u0=u0)
    np.testing.assert_allclose(np.asarray(res.res_history),
                               np.asarray(ref.res_history), rtol=2e-4)


def test_sharded_u0_resume():
    """u0 threads through: restarting from a partial solve continues it."""
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    r1, _ = sharded_solve(cfg, mesh, num_cycles=2, tol=0.0,
                          replicate_below=8)
    r2, _ = sharded_solve(cfg, mesh, num_cycles=2, tol=0.0,
                          replicate_below=8, u0=np.asarray(r1.u))
    full, _ = sharded_solve(cfg, mesh, num_cycles=4, tol=0.0,
                            replicate_below=8)
    np.testing.assert_allclose(np.asarray(r2.u), np.asarray(full.u),
                               rtol=1e-5, atol=1e-9)


def test_api_mesh_routes_to_sharded():
    """solve_poisson/solve_diffusion accept mesh= with the same surface."""
    from tpu_multigrid.api import solve_diffusion, solve_poisson

    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32, use_pallas=False)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    res = solve_poisson(6, config=cfg, forcing=_forcing, mesh=mesh,
                        num_cycles=4, tol=None)
    assert int(res.iterations) == 4
    h = np.asarray(res.res_history)
    assert (h[1:] / h[:-1] < 0.25).all()

    resd = solve_diffusion(6, config=cfg, coefficient=_jump,
                           forcing=_forcing, mesh=mesh, num_cycles=4,
                           tol=None)
    # Routing check, not a rate benchmark: the 10:1 jump converges at
    # ~0.18/cycle, so 4 cycles give ~1e-3 (measured 1.04e-3).
    assert np.asarray(resd.res_history)[4] < 2e-3 * np.asarray(
        resd.res_history)[0]

    with pytest.raises(ValueError):
        solve_poisson(6, config=cfg, mesh=mesh, boundary=1.0, num_cycles=2,
                      tol=None)


def test_api_mesh_matches_single_device_f64():
    """mesh=(1x1) == the sharded reference in f64 to 1e-12 (VERDICT r2
    next-#4 'done' criterion)."""
    cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                          dtype=jnp.float64, use_pallas=False)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    mesh1 = make_grid_mesh(shape=(1, 1), devices=jax.devices()[:1])
    res, _ = sharded_solve(cfg, mesh, forcing=_forcing, num_cycles=4,
                           tol=0.0, replicate_below=8)
    ref, _ = sharded_solve(cfg, mesh1, forcing=_forcing, num_cycles=4,
                           tol=0.0, replicate_below=8)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(res.res_history),
                               np.asarray(ref.res_history), rtol=1e-12)

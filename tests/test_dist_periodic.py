"""Distributed periodic (torus) Poisson (dist/periodic.py).

1-vs-N parity of the wrap local ops (f64) against PeriodicOp, end-to-end
parity vs the single-chip periodic solve, gauge preservation, API route.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.dist import periodic as DP
from tpu_multigrid.dist.mesh import make_grid_mesh, place
from tpu_multigrid.dist.periodic import periodic_sharded_solve
from tpu_multigrid.problems.periodic import PeriodicOp

SPEC = P("gy", "gx")


def _shard_apply(mesh, fn, *arrays):
    f = shard_map(fn, mesh=mesh, in_specs=(SPEC,) * len(arrays),
                  out_specs=SPEC, check_vma=False)
    return jax.jit(f)(*(place(a, mesh) for a in arrays))


def _torus(n, rng, dtype=jnp.float64):
    a = rng.standard_normal((n, n))
    return jnp.asarray(a - a.mean(), dtype)


@pytest.mark.parametrize("mesh_shape", [(2, 2), (2, 4), (1, 4)])
def test_wrap_local_ops_match_global(mesh_shape, rng):
    my, mx = mesh_shape
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    n = 32
    op = PeriodicOp(n)
    u, b = _torus(n, rng), _torus(n, rng)

    cases = [
        ("residual", lambda ul, bl: DP.residual_wrap_local(ul, bl),
         op.residual(u, b)),
        ("jacobi3", lambda ul, bl: DP.jacobi_wrap_local(ul, bl, 2 / 3, 3),
         op.smooth(u, b, smoother="jacobi", omega=2 / 3, sweeps=3)),
        ("rbgs2", lambda ul, bl: DP.rbgs_wrap_local(ul, bl, 2),
         op.smooth(u, b, smoother="rbgs", omega=2 / 3, sweeps=2)),
    ]
    for name, fn, want in cases:
        got = _shard_apply(mesh, fn, u, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-13, err_msg=name)

    # transfers (coarse arrays sharded with the same spec)
    opc = PeriodicOp(n // 2)
    f = shard_map(lambda rl: DP.restrict_wrap_local(rl), mesh=mesh,
                  in_specs=(SPEC,), out_specs=SPEC, check_vma=False)
    got_r = jax.jit(f)(place(b, mesh))
    want_r = opc.restrict_into(b, op)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=1e-12, atol=1e-13)

    ec = _torus(n // 2, rng)
    g = shard_map(lambda ul, el: DP.prolong_add_wrap_local(ul, el),
                  mesh=mesh, in_specs=(SPEC, SPEC), out_specs=SPEC,
                  check_vma=False)
    got_p = jax.jit(g)(place(u, mesh), place(ec, mesh))
    want_p = opc.prolong_add_into(u, ec, op)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-12, atol=1e-13)


def _forcing(x, y):
    return (jnp.sin(2 * math.pi * x) * jnp.cos(4 * math.pi * y)
            + jnp.cos(2 * math.pi * (x + y)))


@pytest.mark.parametrize("mesh_shape", [(1, 1), (2, 2)])
def test_periodic_sharded_matches_single_chip(mesh_shape):
    my, mx = mesh_shape
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    res, levels = periodic_sharded_solve(cfg, mesh, forcing=_forcing,
                                         num_cycles=6, replicate_below=8)
    assert levels.num_sharded >= 1
    ref = mg.solve_poisson(6, config=cfg, bc="periodic", forcing=_forcing,
                           num_cycles=6, tol=None)
    h = np.asarray(res.res_history)
    hr = np.asarray(ref.res_history)
    np.testing.assert_allclose(h[:-2] / h[0], hr[:-2] / hr[0], rtol=2e-3)
    # deepest entries: f32 roundoff is a larger fraction of the value
    np.testing.assert_allclose(h[-2:] / h[0], hr[-2:] / hr[0], rtol=0.1)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-7)
    # mean-zero gauge preserved
    assert abs(float(np.asarray(res.u).mean())) < 1e-7


def test_periodic_sharded_until_tol_f64():
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float64)
    mesh = make_grid_mesh(shape=(2, 4), devices=jax.devices()[:8])
    res, _ = periodic_sharded_solve(cfg, mesh, forcing=_forcing,
                                    tol=1e-11, max_cycles=40,
                                    replicate_below=4)
    assert bool(res.converged)
    h = np.asarray(res.res_history)
    h = h[np.isfinite(h)]
    assert h[-1] / h[0] <= 1e-11


def test_api_mesh_periodic():
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    res = mg.solve_poisson(6, config=cfg, bc="periodic", mesh=mesh,
                           forcing=_forcing, tol=1e-5)
    assert bool(res.converged)
    assert np.asarray(res.u).shape == (64, 64)
    with pytest.raises(ValueError, match="incompatible"):
        mg.solve_poisson(6, config=cfg, bc="periodic", mesh=mesh,
                         forcing=_forcing, refined=True)

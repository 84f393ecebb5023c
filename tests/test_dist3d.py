"""Distributed 3D tests on a virtual 8-device CPU mesh: shard-local
7-point operators and the sharded V-cycle driver vs the single-device
``core.ops3d`` reference (tests/test_dist.py is the 2D analogue)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_multigrid import MultigridConfig
from tpu_multigrid.core import ops3d
from tpu_multigrid.cycles import solve_until_tol
from tpu_multigrid.dist import local_ops3 as L3
from tpu_multigrid.dist.shard_cycle3 import (make_grid_mesh3,
                                             sharded_level_sizes3,
                                             sharded_solve3)
from tpu_multigrid.problems import Poisson3DProblem

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _shard_apply3(mesh, fn, *arrays):
    spec = P("gz", "gy", None)
    from jax import shard_map
    f = shard_map(fn, mesh=mesh, in_specs=(spec,) * len(arrays),
                  out_specs=spec, check_vma=False)
    placed = [jax.device_put(a, NamedSharding(mesh, spec)) for a in arrays]
    return jax.jit(f)(*placed)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 8), (2, 2)])
def test_local_ops3_match_global(mesh_shape, rng):
    mz, my = mesh_shape
    mesh = make_grid_mesh3(shape=mesh_shape,
                           devices=jax.devices()[: mz * my])
    n, S = 14, 16
    u = np.zeros((S, S, S))
    b = np.zeros((S, S, S))
    u[1:n, 1:n, 1:n] = rng.standard_normal((n - 1,) * 3)
    b[1:n, 1:n, 1:n] = rng.standard_normal((n - 1,) * 3)
    u, b = jnp.asarray(u), jnp.asarray(b)

    cases = [
        ("apply", lambda ul, bl: L3.apply_poisson_local3(ul, n),
         ops3d.apply_poisson3(u, n)),
        ("residual", lambda ul, bl: L3.residual_local3(ul, bl, n),
         ops3d.residual3(u, b, n)),
        ("jacobi3", lambda ul, bl: L3.jacobi_local3(ul, bl, n, 2 / 3, 3),
         ops3d.jacobi_sweeps3(u, b, n, 2 / 3, 3)),
        ("rbgs2", lambda ul, bl: L3.rbgs_local3(ul, bl, n, 2),
         ops3d.redblack_gs_sweeps3(u, b, n, 2)),
    ]
    for name, fn, want in cases:
        got = _shard_apply3(mesh, fn, u, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-13, err_msg=name)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (2, 2)])
def test_transfers3_match_global(mesh_shape, rng):
    mz, my = mesh_shape
    mesh = make_grid_mesh3(shape=mesh_shape,
                           devices=jax.devices()[: mz * my])
    nf, nc = 14, 7
    Sf, Sc = 16, 8
    r = np.zeros((Sf,) * 3)
    r[1:nf, 1:nf, 1:nf] = rng.standard_normal((nf - 1,) * 3)
    e = np.zeros((Sc,) * 3)
    e[1:nc, 1:nc, 1:nc] = rng.standard_normal((nc - 1,) * 3)
    r, e = jnp.asarray(r), jnp.asarray(e)

    spec = P("gz", "gy", None)
    from jax import shard_map
    restrict = jax.jit(shard_map(
        lambda rl: L3.restrict_fw_local3(rl, nf), mesh=mesh,
        in_specs=(spec,), out_specs=spec, check_vma=False))
    got_rc = restrict(jax.device_put(r, NamedSharding(mesh, spec)))
    want_rc = ops3d.restrict_fw3(r, nf, Sc)
    np.testing.assert_allclose(np.asarray(got_rc), np.asarray(want_rc),
                               rtol=1e-12, atol=1e-13)

    prolong = jax.jit(shard_map(
        lambda el: L3.prolong_local3(el, nc), mesh=mesh,
        in_specs=(spec,), out_specs=spec, check_vma=False))
    got_p = prolong(jax.device_put(e, NamedSharding(mesh, spec)))
    want_p = ops3d.prolong3(e, nc, Sf)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-12, atol=1e-13)


def test_level_split3():
    cfg = MultigridConfig(finest_level=5, coarsest_level=2)
    lv = sharded_level_sizes3(cfg, (2, 4))
    assert lv.num_sharded >= 1
    # sharded levels halve exactly and divide the mesh
    for (n, S), (n2, S2) in zip(lv.sizes, lv.sizes[1:]):
        if S2 == S // 2:
            assert S % 2 == 0


def test_sharded_solve3_matches_single_device():
    """1-vs-8-device parity of the full distributed 3D solve."""
    cfg = MultigridConfig(finest_level=4, coarsest_level=2,
                          smoother="chebyshev", nu1=3, nu2=2,
                          dtype=jnp.float32)
    mesh = make_grid_mesh3(shape=(2, 4), devices=jax.devices()[:8])
    res, levels = sharded_solve3(cfg, mesh, tol=1e-5, replicate_below=4)
    assert bool(res.converged)

    prob = Poisson3DProblem(cfg, align=16, min_pad_level=0)
    ref = solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-5)
    n = 16
    a = np.asarray(res.u)[1:n, 1:n, 1:n]
    w = np.asarray(ref.u)[1:n, 1:n, 1:n]
    assert np.abs(a - w).max() / np.abs(w).max() < 1e-4


def test_sharded_solve3_w_cycle():
    cfg = MultigridConfig(finest_level=4, coarsest_level=2, cycle="W",
                          smoother="chebyshev", nu1=3, nu2=2,
                          dtype=jnp.float32)
    mesh = make_grid_mesh3(shape=(2, 2), devices=jax.devices()[:4])
    res, _ = sharded_solve3(cfg, mesh, tol=1e-5, replicate_below=4)
    assert bool(res.converged)


def test_solve_poisson3d_mesh_dispatch():
    """api.solve_poisson3d(mesh=...) routes to the 3D sharded path."""
    import tpu_multigrid as mg
    from tpu_multigrid.dist.shard_cycle3 import make_grid_mesh3

    mesh = make_grid_mesh3(shape=(2, 2), devices=jax.devices()[:4])
    cfg = mg.MultigridConfig(finest_level=5, coarsest_level=2)
    res = mg.solve_poisson3d(5, config=cfg, mesh=mesh, tol=1e-4)
    assert bool(res.converged)
    with pytest.raises(ValueError):
        mg.solve_poisson3d(5, config=cfg, mesh=mesh, refined=True)

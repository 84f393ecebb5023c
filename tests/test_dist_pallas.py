"""Sharded fused-Pallas path (dist.pallas_cycle): 1-vs-N parity on the
virtual CPU mesh in interpret mode (VERDICT r1 item 2 "done" criterion).

The extended-block kernels (kernels/local.py) must reproduce the jnp
shard-local path (dist.shard_cycle / dist.local_ops) and the single-device
global solver bit-for-bit up to f32 accumulation order: same residual
histories, same solutions on the owned regions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid import MultigridConfig
from tpu_multigrid.dist.mesh import make_grid_mesh
from tpu_multigrid.dist.pallas_cycle import (pallas_level_sizes,
                                             sharded_solve_pallas)
from tpu_multigrid.dist.shard_cycle import sharded_solve

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices")

# NOTE: all meshes here use <= 4 devices.  Pallas interpret-mode programs
# under shard_map DEADLOCK with 8 virtual devices on this single-core
# container (plain-jnp 8-device shard_map is fine) — see CLAUDE.md.


def _pallas(cfg, mesh_shape, **kw):
    my, mx = mesh_shape
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    with pltpu.force_tpu_interpret_mode():
        return sharded_solve_pallas(cfg, mesh, **kw)


@pytest.mark.parametrize("mesh_shape", [(2, 2), (1, 4), (4, 1), (1, 1)])
def test_pallas_sharded_matches_jnp_sharded(mesh_shape):
    cfg = MultigridConfig(finest_level=9, coarsest_level=3,
                          dtype=jnp.float32)
    res, lv = _pallas(cfg, mesh_shape, num_cycles=4, tol=0.0,
                      replicate_below=64)
    assert lv.num_sharded >= 1, lv
    my, mx = mesh_shape
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    ref, _ = sharded_solve(cfg, mesh, num_cycles=4, tol=0.0,
                           replicate_below=8)
    _close_histories(res.res_history, ref.res_history)


def _close_histories(got, want):
    """Histories match to f32 accumulation noise.

    Near the f32 residual floor (late cycles) the two paths' different
    rounding makes trajectories diverge in *relative* terms while both sit
    at the same tiny absolute level — hence the r0-scaled atol.
    """
    got, want = np.asarray(got), np.asarray(want)
    np.testing.assert_allclose(got, want, rtol=3e-3,
                               atol=2e-4 * float(want[0]))


def test_pallas_sharded_matches_single_device_solution():
    """Owned-region solution == the global single-device solve."""
    from tpu_multigrid.cycles import solve_fixed
    from tpu_multigrid.core.operators import poisson_op
    from tpu_multigrid.core.grids import Hierarchy, coarse_dense_inverse

    cfg = MultigridConfig(finest_level=8, coarsest_level=3,
                          dtype=jnp.float32)
    res, lv = _pallas(cfg, (2, 2), num_cycles=6, tol=0.0,
                      replicate_below=64)
    # Global oracle on the same level sizes.
    hops = tuple(poisson_op(n, S) for (n, S) in lv.sizes)
    hier = Hierarchy(hops, coarse_dense_inverse(hops[-1]))
    n0, S0 = lv.sizes[0]
    b = np.zeros((S0, S0), np.float32)
    b[1:n0, 1:n0] = 4.0 * (1.0 / n0) ** 2
    ref = solve_fixed(hier, cfg, jnp.asarray(b), 6)
    _close_histories(res.res_history, ref.res_history)
    np.testing.assert_allclose(np.asarray(res.u)[: n0 + 1, : n0 + 1],
                               np.asarray(ref.u)[: n0 + 1, : n0 + 1],
                               rtol=1e-3, atol=1e-8)


@pytest.mark.parametrize("smoother", ["rbgs", "chebyshev"])
def test_pallas_sharded_smoothers(smoother):
    cfg = MultigridConfig(finest_level=9, coarsest_level=3,
                          dtype=jnp.float32, smoother=smoother)
    res, _ = _pallas(cfg, (2, 2), num_cycles=4, tol=0.0, replicate_below=64)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    ref, _ = sharded_solve(cfg, mesh, num_cycles=4, tol=0.0,
                           replicate_below=8)
    _close_histories(res.res_history, ref.res_history)


@pytest.mark.parametrize("cyc", ["W", "F"])
def test_pallas_sharded_wf_cycles(cyc):
    cfg = MultigridConfig(finest_level=9, coarsest_level=3,
                          dtype=jnp.float32, cycle=cyc)
    res, _ = _pallas(cfg, (2, 2), num_cycles=3, tol=0.0, replicate_below=64)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    ref, _ = sharded_solve(cfg, mesh, num_cycles=3, tol=0.0,
                           replicate_below=8)
    _close_histories(res.res_history, ref.res_history)


def test_pallas_sharded_until_tol():
    cfg = MultigridConfig(finest_level=9, coarsest_level=3,
                          dtype=jnp.float32)
    # tol must sit above the plain-f32 residual floor (~2e-3 relative at
    # level 9: eps*||u||/h^2 vs ||b|| — CLAUDE.md)
    res, _ = _pallas(cfg, (2, 2), tol=1e-2, max_cycles=30,
                     replicate_below=64)
    assert bool(res.converged)
    h = np.asarray(res.res_history)
    it = int(res.iterations)
    assert h[it] <= 1e-2 * h[0]
    assert np.isfinite(h[: it + 1]).all()


def test_pallas_level_sizes_constraints():
    cfg = MultigridConfig(finest_level=12, coarsest_level=3)
    lv = pallas_level_sizes(cfg, (2, 4), replicate_below=256)
    for (n, S) in lv.sharded:
        assert (S // 2) % 16 == 0 and (S // 4) % 256 == 0
    assert lv.num_sharded < len(lv.sizes)


def test_lean_halo_bitwise_matches_full():
    """halo="lean" (depth-reduced strips + elided pre-K2 u exchange) must be
    BITWISE identical to halo="full": the elision claims K1's smoothing of
    the extended strip leaves the inner ghost rings holding exactly what a
    refresh would deliver (pallas_cycle._halo_depths), so any difference at
    all falsifies the validity-depth accounting."""
    cfg = MultigridConfig(finest_level=9, coarsest_level=3,
                          dtype=jnp.float32)
    lean, _ = _pallas(cfg, (2, 2), num_cycles=3, tol=0.0,
                      replicate_below=64, halo="lean")
    full, _ = _pallas(cfg, (2, 2), num_cycles=3, tol=0.0,
                      replicate_below=64, halo="full")
    np.testing.assert_array_equal(np.asarray(lean.res_history),
                                  np.asarray(full.res_history))
    np.testing.assert_array_equal(np.asarray(lean.u), np.asarray(full.u))


def test_lean_halo_bitwise_matches_full_chebyshev_fmg():
    """Same bitwise claim through the FMG driver and the chebyshev
    smoother's step-indexed omegas (different s1/s2 split)."""
    cfg = MultigridConfig(finest_level=9, coarsest_level=3,
                          smoother="chebyshev", nu1=3, nu2=2,
                          dtype=jnp.float32)
    lean, _ = _pallas(cfg, (2, 2), num_cycles=2, tol=0.0,
                      replicate_below=64, halo="lean", use_fmg=True)
    full, _ = _pallas(cfg, (2, 2), num_cycles=2, tol=0.0,
                      replicate_below=64, halo="full", use_fmg=True)
    np.testing.assert_array_equal(np.asarray(lean.res_history),
                                  np.asarray(full.res_history))
    np.testing.assert_array_equal(np.asarray(lean.u), np.asarray(full.u))

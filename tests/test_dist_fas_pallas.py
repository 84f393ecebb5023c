"""Distributed fused FAS (dist.fas_pallas): 1-vs-N parity on the virtual
CPU mesh in interpret mode.

The FAS extended-block kernels (kernels/localfas.py) must reproduce the
jnp shard-local FAS path (dist.fas) and each other across mesh shapes up
to f32 accumulation order.

Mesh sizes: <= 2 devices under the conftest's 8-device default.  The
interpret allocator deadlocks when a mesh uses EVERY virtual device
(CLAUDE.md r4 refinement — measured: K1f on (2,2) with device_count=4
and on (1,2) with device_count=2 both sleep forever in
_allocate_buffer; the same programs run in seconds with spare
devices).  (1,2)/(2,1) exercise both ghost-exchange axes; (2,2) corner
semantics are covered by the jnp dist FAS tests (test_dist_fas.py),
whose halo plumbing the fused path shares.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid import MultigridConfig
from tpu_multigrid.dist.fas import fas_sharded_solve
from tpu_multigrid.dist.fas_pallas import fas_sharded_solve_pallas
from tpu_multigrid.dist.mesh import make_grid_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs 2 virtual devices")

LAM = 4.0


def _phi(u):
    return -LAM * jnp.exp(u)


def _mesh(shape):
    my, mx = shape
    return make_grid_mesh(shape=shape, devices=jax.devices()[: my * mx])


def _pallas(cfg, mesh_shape, **kw):
    with pltpu.force_tpu_interpret_mode():
        return fas_sharded_solve_pallas(cfg, _mesh(mesh_shape), **kw)


def _close_histories(got, want, rtol=3e-3):
    got, want = np.asarray(got), np.asarray(want)
    np.testing.assert_allclose(got, want, rtol=rtol,
                               atol=2e-4 * float(want[0]))


@pytest.mark.slow
def test_fas_pallas_matches_jnp_sharded():
    """Fused dist FAS tracks the jnp dist FAS trajectory (Bratu).

    Level 8 / (2, 2) / 2 cycles: interpret-mode extended-block kernels
    under shard_map are expensive on this 1-core host (level 9 runs
    >25 min under suite contention)."""
    cfg = MultigridConfig(finest_level=8, coarsest_level=4,
                          dtype=jnp.float32)
    res, lv = _pallas(cfg, (1, 2), phi=_phi, dphi=_phi, num_cycles=2,
                      tol=None, replicate_below=64)
    assert lv.num_sharded >= 1, lv
    ref, _ = fas_sharded_solve(cfg, _mesh((1, 2)), phi=_phi, dphi=_phi,
                               num_cycles=2, tol=None, replicate_below=8)
    _close_histories(res.res_history, ref.res_history)


@pytest.mark.slow
def test_fas_pallas_1_vs_2_solution_parity():
    cfg = MultigridConfig(finest_level=8, coarsest_level=4,
                          dtype=jnp.float32)
    r2, _ = _pallas(cfg, (2, 1), phi=_phi, dphi=_phi, num_cycles=2,
                    tol=None, replicate_below=64)
    r1, _ = _pallas(cfg, (1, 1), phi=_phi, dphi=_phi, num_cycles=2,
                    tol=None, replicate_below=64)
    np.testing.assert_allclose(np.asarray(r2.u), np.asarray(r1.u),
                               rtol=1e-5, atol=1e-6)
    _close_histories(r2.res_history, r1.res_history, rtol=1e-4)


@pytest.mark.slow
def test_fas_pallas_quasilinear_until_tol():
    """Quasilinear family on the fused dist tier: converges and the
    fused nonlinear resnorm drives until-tol."""
    a = lambda u: 1.0 + 2.0 * u * u
    # coarsest 3 (9^2): the flux operator has no dense Newton, so the
    # coarsest is Picard sweeps — at 17^2 they are too inexact and drag
    # the V-cycle rate to 0.59 (measured, identical to single-chip);
    # at 9^2 the overall rate is ~0.3 (QuasilinearDiffusionProblem doc).
    cfg = MultigridConfig(finest_level=8, coarsest_level=3,
                          dtype=jnp.float32, coarse_smooth_sweeps=40)
    # tol 1e-3 relative: the f32 nonlinear floor at this size is ~4e-4
    # relative (measured stall at 5.7e-6 absolute from r0 = 1.56e-2),
    # so deeper relative targets cannot be certified in f32.
    res, _ = _pallas(cfg, (1, 2), a=a, tol=1e-3, max_cycles=10,
                     replicate_below=64)
    h = np.asarray(res.res_history)
    it = int(res.iterations)
    assert bool(res.converged), h
    assert h[it] / h[0] <= 1e-3


def test_fas_pallas_rejects_bad_args():
    cfg = MultigridConfig(finest_level=8, coarsest_level=4)
    with pytest.raises(ValueError, match="exactly one"):
        fas_sharded_solve_pallas(cfg, _mesh((1, 1)))
    with pytest.raises(ValueError, match="tol or num_cycles"):
        fas_sharded_solve_pallas(cfg, _mesh((1, 1)), phi=_phi, dphi=_phi,
                                 tol=None)

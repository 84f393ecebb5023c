"""Sharded fused-Pallas 3D VARIABLE-COEFFICIENT path
(dist.pallas_cycle3.sharded_solve_pallas_var3): K1v₃/K2v₃ on
ghost-extended shards with statically pre-exchanged coefficient blocks.

1-vs-N parity on the virtual CPU mesh in interpret mode, mirroring
tests/test_dist_pallas3.py.  All meshes here use <= 3 devices: the 3D
extended-block kernels under shard_map interpret DEADLOCK at 4 virtual
devices on this single-core container (CLAUDE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid import MultigridConfig
from tpu_multigrid.cycles import solve_fixed
from tpu_multigrid.dist.pallas_cycle3 import (pallas_var_level_sizes3,
                                              sharded_solve_pallas_var3)
from tpu_multigrid.dist.shard_cycle3 import make_grid_mesh3
from tpu_multigrid.problems.diffusion3d import Diffusion3DProblem

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 3, reason="needs 3 virtual devices")


def _coef(x, y, z):
    return 1.0 + 10.0 * ((x > 0.5) & (z > 0.5))


def test_var_level_sizes3_constraints():
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          smoother="chebyshev", nu1=3, nu2=2)
    lv = pallas_var_level_sizes3(cfg, (2, 1), replicate_below=16)
    assert lv.num_sharded >= 1
    for (n, S, Sx) in lv.sizes[: lv.num_sharded]:
        assert S % 2 == 0 and Sx % 128 == 0


@pytest.mark.parametrize("mesh_shape", [(2, 1), (3, 1)])
def test_pallas_var3_solve_matches_single_device(mesh_shape):
    """Distributed fused var-coefficient 3D solve == the single-device
    solver on the owned regions (f32 accumulation-order tolerance)."""
    mz, my = mesh_shape
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          smoother="chebyshev", nu1=3, nu2=2,
                          dtype=jnp.float32)
    mesh = make_grid_mesh3(shape=mesh_shape,
                           devices=jax.devices()[: mz * my])
    with pltpu.force_tpu_interpret_mode():
        res, levels = sharded_solve_pallas_var3(
            cfg, mesh, coefficient=_coef, num_cycles=2, tol=0.0,
            replicate_below=16)
        jax.block_until_ready(res.u)
    assert levels.num_sharded >= 1
    h = np.asarray(res.res_history)
    assert np.isfinite(h[2]) and h[2] < 0.5 * h[0]

    prob = Diffusion3DProblem(cfg, coefficient=_coef, align=16,
                              min_pad_level=0, lane_align=128)
    ref = solve_fixed(prob.hierarchy, cfg, prob.rhs(), num_cycles=2)
    n = 64
    a = np.asarray(res.u)[1:n, 1:n, 1:n]
    w = np.asarray(ref.u)[1:n, 1:n, 1:n]
    assert np.abs(a - w).max() / np.abs(w).max() < 1e-4


def test_pallas_var3_lean_halo_bitwise_matches_full():
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          smoother="chebyshev", nu1=3, nu2=2,
                          dtype=jnp.float32)
    mesh = make_grid_mesh3(shape=(2, 1), devices=jax.devices()[:2])
    with pltpu.force_tpu_interpret_mode():
        lean, _ = sharded_solve_pallas_var3(
            cfg, mesh, coefficient=_coef, num_cycles=2, tol=0.0,
            replicate_below=16, halo="lean")
        jax.block_until_ready(lean.u)
        full, _ = sharded_solve_pallas_var3(
            cfg, mesh, coefficient=_coef, num_cycles=2, tol=0.0,
            replicate_below=16, halo="full")
        jax.block_until_ready(full.u)
    np.testing.assert_array_equal(np.asarray(lean.res_history),
                                  np.asarray(full.res_history))


class TestDirectionalConv3:
    """Distributed fused DIRECTIONAL path (6-plane variable-wind upwind,
    dist.pallas_cycle3.sharded_solve_pallas_conv3) — VERDICT r4 next #1's
    dist story."""

    WINDS = dict(
        bx=lambda x, y, z: np.sin(2 * np.pi * x) * (0.5 + z),
        by=lambda x, y, z: np.cos(2 * np.pi * y) - 0.3,
        bz=lambda x, y, z: x - y,
    )

    def test_conv3_solve_matches_single_device(self):
        from tpu_multigrid.dist.pallas_cycle3 import (
            sharded_solve_pallas_conv3)
        from tpu_multigrid.problems.convection3d import (
            ConvectionDiffusion3DProblem)

        cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                              smoother="rbgs", nu1=2, nu2=1,
                              dtype=jnp.float32)
        mesh = make_grid_mesh3(shape=(2, 1), devices=jax.devices()[:2])
        with pltpu.force_tpu_interpret_mode():
            res, levels = sharded_solve_pallas_conv3(
                cfg, mesh, eps=0.1, **self.WINDS, num_cycles=2, tol=0.0,
                replicate_below=16)
            jax.block_until_ready(res.u)
        assert levels.num_sharded >= 1
        h = np.asarray(res.res_history)
        assert np.isfinite(h[2]) and h[2] < 0.5 * h[0]

        prob = ConvectionDiffusion3DProblem(
            cfg, eps=0.1, **self.WINDS, align=16, min_pad_level=0,
            lane_align=128)
        ref = solve_fixed(prob.hierarchy, cfg, prob.rhs(), num_cycles=2)
        n = 64
        a = np.asarray(res.u)[1:n, 1:n, 1:n]
        w = np.asarray(ref.u)[1:n, 1:n, 1:n]
        assert np.abs(a - w).max() / np.abs(w).max() < 1e-4

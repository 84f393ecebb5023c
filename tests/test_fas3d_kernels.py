"""Fused 3D FAS super-kernels (kernels/fas3d.py) vs the jnp FAS tier.

Interpret mode on CPU.  The fused shapes start at Sx = 256 (n = 128),
which is heavyweight under interpret on this 1-core host — the kernel
parity tests live in the slow tier; the dispatch-gate test stays fast.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid import MultigridConfig
from tpu_multigrid.core import ops, ops3d
from tpu_multigrid.core.nonlinear import (PointwiseNonlinearOp,
                                          inject_solution3)
from tpu_multigrid.core.operators import ConstStencilOp3D
from tpu_multigrid.cycles.fas import _use_fas_super_kernels, fas_cycle
from tpu_multigrid.kernels import fas3d as KF3
from tpu_multigrid.problems.bratu import Bratu3DProblem

LAM = 4.0


def _phi(u):
    return -LAM * jnp.exp(u)


N, S, SX = 128, 144, 256
NC, SC, SCX = 64, 80, 128


def _ops_pair():
    return (PointwiseNonlinearOp(ConstStencilOp3D(N, S, SX), _phi, _phi,
                                 diag=6.0),
            PointwiseNonlinearOp(ConstStencilOp3D(NC, SC, SCX), _phi, _phi,
                                 diag=6.0))


def _grids(seed=0, scale=0.1):
    rng = np.random.default_rng(seed)
    u = np.zeros((S, S, SX), np.float32)
    b = np.zeros((S, S, SX), np.float32)
    u[1:N, 1:N, 1:N] = scale * rng.standard_normal((N - 1,) * 3)
    b[1:N, 1:N, 1:N] = rng.standard_normal((N - 1,) * 3)
    return jnp.asarray(u), jnp.asarray(b)


def test_dispatch_gate_3d():
    cfg = MultigridConfig(finest_level=7, coarsest_level=4,
                          use_pallas=True)
    p = Bratu3DProblem(cfg, lam=LAM, align=16, min_pad_level=0,
                       lane_align=128)
    h = p.hierarchy
    assert _use_fas_super_kernels(h.levels[0], h.levels[1], cfg,
                                  jnp.float32)
    cfg_j = dataclasses.replace(cfg, use_pallas=False)
    assert not _use_fas_super_kernels(h.levels[0], h.levels[1], cfg_j,
                                      jnp.float32)
    # default cubic (unaligned) hierarchy -> geometry gate rejects
    p1 = Bratu3DProblem(cfg, lam=LAM)
    assert not _use_fas_super_kernels(p1.hierarchy.levels[0],
                                      p1.hierarchy.levels[1], cfg,
                                      jnp.float32)


@pytest.mark.slow
def test_k1f3_matches_jnp_pieces():
    op, opc = _ops_pair()
    u, b = _grids()
    with pltpu.force_tpu_interpret_mode():
        gu, guc, gbc = jax.block_until_ready(KF3.fas_smooth_restrict3(
            u, b, N, (SC, SC, SCX), 2, 2 / 3, _phi, _phi, float(op.h2),
            6.0))
    wu = op.nsmooth(u, b, omega=2 / 3, sweeps=2)
    wuc = inject_solution3(wu, N, (SC, SC, SCX))
    wbc = opc.apply(wuc) + ops3d.restrict_fw3(op.residual(wu, b), N,
                                              (SC, SC, SCX))
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(guc), np.asarray(wuc),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gbc), np.asarray(wbc),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_k2f3_matches_jnp_with_resnorm():
    op, _ = _ops_pair()
    u, b = _grids()
    rng = np.random.default_rng(3)
    ec = np.zeros((SC, SC, SCX), np.float32)
    ec[1:NC, 1:NC, 1:NC] = 0.05 * rng.standard_normal((NC - 1,) * 3)
    ec = jnp.asarray(ec)
    with pltpu.force_tpu_interpret_mode():
        g2, gn = jax.block_until_ready(KF3.fas_prolong_smooth_resnorm3(
            u, b, ec, N, 2, 2 / 3, _phi, _phi, float(op.h2), 6.0))
    w2 = op.nsmooth(
        ops3d.mask_interior3(u + ops3d.prolong3(ec, NC, (S, S, SX)), N),
        b, omega=2 / 3, sweeps=2)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(w2),
                               rtol=1e-5, atol=1e-6)
    want = float(ops.norm2(op.residual(g2, b)))
    assert abs(float(gn) - want) <= 1e-4 * max(want, 1.0)


@pytest.mark.slow
def test_fused_fas3d_cycle_matches_jnp_trajectory():
    cfg_f = MultigridConfig(finest_level=7, coarsest_level=4,
                            use_pallas=True)
    cfg_j = dataclasses.replace(cfg_f, use_pallas=False)
    p = Bratu3DProblem(cfg_f, lam=LAM, align=16, min_pad_level=0,
                       lane_align=128)
    h = p.hierarchy
    b = p.rhs()
    u0 = jnp.zeros(h.levels[0].grid_shape, jnp.float32)
    uj = u0
    for _ in range(2):
        uj = fas_cycle(h, cfg_j, uj, b)
    step = jax.jit(lambda v: fas_cycle(h, cfg_f, v, b))
    up = u0
    with pltpu.force_tpu_interpret_mode():
        for _ in range(2):
            up = jax.block_until_ready(step(up))
    np.testing.assert_allclose(np.asarray(up), np.asarray(uj),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_quasilinear3d_cycle_matches_jnp_trajectory():
    from tpu_multigrid.problems.nldiffusion import (
        QuasilinearDiffusion3DProblem)

    cfg_f = MultigridConfig(finest_level=7, coarsest_level=4,
                            use_pallas=True, coarse_smooth_sweeps=40)
    cfg_j = dataclasses.replace(cfg_f, use_pallas=False)
    q = QuasilinearDiffusion3DProblem(cfg_f, gamma=2.0, align=16,
                                      min_pad_level=0, lane_align=128)
    h = q.hierarchy
    assert _use_fas_super_kernels(h.levels[0], h.levels[1], cfg_f,
                                  jnp.float32)
    b = q.rhs()
    u0 = jnp.zeros(h.levels[0].grid_shape, jnp.float32)
    uj = u0
    for _ in range(2):
        uj = fas_cycle(h, cfg_j, uj, b)
    step = jax.jit(lambda v: fas_cycle(h, cfg_f, v, b))
    up = u0
    with pltpu.force_tpu_interpret_mode():
        for _ in range(2):
            up = jax.block_until_ready(step(up))
    np.testing.assert_allclose(np.asarray(up), np.asarray(uj),
                               rtol=1e-4, atol=1e-5)

"""Fused FAS super-kernels (kernels/fas.py) vs the jnp FAS tier.

Interpret mode on CPU (SURVEY.md §4 tier 5).  Motivated by the r4 on-chip
measurement (BENCH.md "FAS tier cost A/B"): the jnp FAS Bratu cycle is
41x the fused linear cycle — the nonlinearity is pointwise, so the same
temporal-blocking kernels apply with a Jacobi-Newton step function.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid import MultigridConfig
from tpu_multigrid.core import ops
from tpu_multigrid.core.nonlinear import PointwiseNonlinearOp, inject_solution
from tpu_multigrid.core.operators import poisson_op
from tpu_multigrid.cycles.fas import (_use_fas_super_kernels, fas_cycle,
                                      fas_solve_fixed)
from tpu_multigrid.kernels import fas as KF
from tpu_multigrid.problems.bratu import BratuProblem

LAM = 4.0


def _phi(u):
    return -LAM * jnp.exp(u)


def _ops_pair(n, S, nc, Sc):
    return (PointwiseNonlinearOp(poisson_op(n, S), _phi, _phi, diag=4.0),
            PointwiseNonlinearOp(poisson_op(nc, Sc), _phi, _phi, diag=4.0))


def _grids(S, n, seed=0, scale=0.1):
    rng = np.random.default_rng(seed)
    u = np.zeros((S, S), np.float32)
    b = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = scale * rng.standard_normal((n - 1, n - 1))
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    return jnp.asarray(u), jnp.asarray(b)


# Multi-tile rows, non-power-of-two interiors, edge clamping.
CASES = [(512, 256, 384, 128), (512, 500, 384, 250), (768, 700, 512, 350)]


@pytest.mark.parametrize("S,n,Sc,nc", CASES)
def test_k1f_matches_jnp_pieces(S, n, Sc, nc):
    op, opc = _ops_pair(n, S, nc, Sc)
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        gu, guc, gbc = jax.block_until_ready(KF.fas_smooth_restrict(
            u, b, n, Sc, 2, 2 / 3, _phi, _phi, float(op.h2), 4.0))
    wu = op.nsmooth(u, b, omega=2 / 3, sweeps=2)
    wuc = inject_solution(wu, n, Sc)
    wbc = opc.apply(wuc) + ops.restrict_fw(op.residual(wu, b), n, Sc)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(guc), np.asarray(wuc),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gbc), np.asarray(wbc),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S,n,Sc,nc", CASES[:2])
def test_k2f_matches_jnp(S, n, Sc, nc):
    op, _ = _ops_pair(n, S, nc, Sc)
    u, b = _grids(S, n)
    ec = _grids(Sc, nc, seed=3, scale=0.05)[0]
    with pltpu.force_tpu_interpret_mode():
        g2 = jax.block_until_ready(KF.fas_prolong_smooth(
            u, b, ec, n, 2, 2 / 3, _phi, _phi, float(op.h2), 4.0))
    w2 = op.nsmooth(ops.mask_interior(u + ops.prolong(ec, nc, S), n), b,
                    omega=2 / 3, sweeps=2)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(w2),
                               rtol=1e-5, atol=1e-6)


def test_k2f_fused_resnorm():
    S, n, Sc, nc = CASES[0]
    op, _ = _ops_pair(n, S, nc, Sc)
    u, b = _grids(S, n)
    ec = _grids(Sc, nc, seed=3, scale=0.05)[0]
    with pltpu.force_tpu_interpret_mode():
        g2, gn = jax.block_until_ready(KF.fas_prolong_smooth_resnorm(
            u, b, ec, n, 2, 2 / 3, _phi, _phi, float(op.h2), 4.0))
    want = float(ops.norm2(op.residual(g2, b)))
    assert abs(float(gn) - want) <= 1e-4 * max(want, 1.0)


def test_dispatch_gate():
    cfg = MultigridConfig(finest_level=7, coarsest_level=4, use_pallas=True)
    p = BratuProblem(cfg, lam=LAM, align=256, min_pad_level=0)
    h = p.hierarchy
    assert _use_fas_super_kernels(h.levels[0], h.levels[1], cfg,
                                  jnp.float32)
    # off switch
    cfg_j = dataclasses.replace(cfg, use_pallas=False)
    assert not _use_fas_super_kernels(h.levels[0], h.levels[1], cfg_j,
                                      jnp.float32)
    # unaligned hierarchy -> geometry gate rejects
    p1 = BratuProblem(cfg, lam=LAM)
    assert not _use_fas_super_kernels(p1.hierarchy.levels[0],
                                      p1.hierarchy.levels[1], cfg,
                                      jnp.float32)
    # non-pointwise operator family -> rejected
    from tpu_multigrid.problems.nldiffusion import QuasilinearDiffusionProblem
    q = QuasilinearDiffusionProblem(cfg, gamma=1.0)
    assert not _use_fas_super_kernels(q.hierarchy.levels[0],
                                      q.hierarchy.levels[1], cfg,
                                      jnp.float32)


def test_quasilinear_k1f_k2f_match_jnp_pieces():
    from tpu_multigrid.core.nonlinear import QuasilinearFluxOp

    S, n, Sc, nc = CASES[1]
    a = lambda u: 1.0 + 2.0 * u * u
    op = QuasilinearFluxOp(n, S, a, lambda u: 4.0 * u)
    opc = QuasilinearFluxOp(nc, Sc, a, lambda u: 4.0 * u)
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        gu, guc, gbc = jax.block_until_ready(KF.qfas_smooth_restrict(
            u, b, n, Sc, 2, 2 / 3, a))
    wu = op.nsmooth(u, b, omega=2 / 3, sweeps=2)
    wuc = inject_solution(wu, n, Sc)
    wbc = opc.apply(wuc) + ops.restrict_fw(op.residual(wu, b), n, Sc)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(guc), np.asarray(wuc),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gbc), np.asarray(wbc),
                               rtol=1e-5, atol=1e-5)

    ec = _grids(Sc, nc, seed=3, scale=0.05)[0]
    with pltpu.force_tpu_interpret_mode():
        g2, gn = jax.block_until_ready(KF.qfas_prolong_smooth_resnorm(
            u, b, ec, n, 2, 2 / 3, a))
    w2 = op.nsmooth(ops.mask_interior(u + ops.prolong(ec, nc, S), n), b,
                    omega=2 / 3, sweeps=2)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(w2),
                               rtol=1e-5, atol=1e-6)
    want = float(ops.norm2(op.residual(g2, b)))
    assert abs(float(gn) - want) <= 1e-4 * max(want, 1.0)


@pytest.mark.slow
def test_quasilinear_fused_cycle_matches_jnp_trajectory():
    from tpu_multigrid.problems.nldiffusion import QuasilinearDiffusionProblem

    cfg_f = MultigridConfig(finest_level=8, coarsest_level=5,
                            use_pallas=True, coarse_smooth_sweeps=40)
    cfg_j = dataclasses.replace(cfg_f, use_pallas=False)
    p = QuasilinearDiffusionProblem(cfg_f, gamma=2.0, align=256,
                                    min_pad_level=0)
    h = p.hierarchy
    assert _use_fas_super_kernels(h.levels[0], h.levels[1], cfg_f,
                                  jnp.float32)
    b = p.rhs()
    u0 = jnp.zeros((h.levels[0].S,) * 2, jnp.float32)
    uj = u0
    for _ in range(3):
        uj = fas_cycle(h, cfg_j, uj, b)
    step = jax.jit(lambda u: fas_cycle(h, cfg_f, u, b))
    up = u0
    with pltpu.force_tpu_interpret_mode():
        for _ in range(3):
            up = jax.block_until_ready(step(up))
    np.testing.assert_allclose(np.asarray(up), np.asarray(uj),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_fas_cycle_matches_jnp_trajectory():
    """3 fused FAS V-cycles track the jnp trajectory on the SAME padded
    hierarchy (each interpret launch jit-wrapped per CLAUDE.md)."""
    cfg_f = MultigridConfig(finest_level=8, coarsest_level=5,
                            use_pallas=True)
    cfg_j = dataclasses.replace(cfg_f, use_pallas=False)
    p = BratuProblem(cfg_f, lam=LAM, align=256, min_pad_level=0)
    h = p.hierarchy
    b = p.rhs()
    u0 = jnp.zeros((h.levels[0].S,) * 2, jnp.float32)

    uj = u0
    for _ in range(3):
        uj = fas_cycle(h, cfg_j, uj, b)

    step = jax.jit(lambda u: fas_cycle(h, cfg_f, u, b))
    up = u0
    with pltpu.force_tpu_interpret_mode():
        for _ in range(3):
            up = jax.block_until_ready(step(up))

    np.testing.assert_allclose(np.asarray(up), np.asarray(uj),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_fas_solve_converges():
    """fas_solve_fixed through the fused dispatch reduces the nonlinear
    residual like the jnp tier (h-independent FAS rates)."""
    cfg = MultigridConfig(finest_level=8, coarsest_level=5,
                          use_pallas=True)
    p = BratuProblem(cfg, lam=LAM, align=256, min_pad_level=0)
    b = p.rhs()
    with pltpu.force_tpu_interpret_mode():
        res = jax.block_until_ready(
            jax.jit(lambda bb: fas_solve_fixed(p.hierarchy, cfg, bb, 4))(b))
    hist = np.asarray(res.res_history)
    # 4 cycles reach the vicinity of the level-8 f32 floor (the jnp tier
    # lands at 8.9e-4 relative on the same hierarchy).
    assert hist[4] / hist[0] < 1e-3

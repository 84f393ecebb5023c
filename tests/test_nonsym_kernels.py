"""Nonsymmetric (9-plane) Pallas var kernels vs the jnp path
(VERDICT r3 next #3: upwind convection-diffusion rides K1v/K2v).

Interpret-mode parity of the 9-plane streaming against VarStencilOp,
until-tol trajectory parity of the fused solve vs the jnp solve, and
MG-BiCGStab on the fused operator.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.core import ops
from tpu_multigrid.kernels import varstencil as V
from tpu_multigrid.kernels import vartransfer as VT
from tpu_multigrid.problems.convection import (ConvectionDiffusionProblem,
                                               convection_diffusion_op)


def _setup(S, n, seed=0, eps=0.01):
    rng = np.random.default_rng(seed)
    u = np.zeros((S, S), np.float32)
    b = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    op = convection_diffusion_op(
        n, S, eps, lambda x, y: 1.0 + 0.0 * x,
        lambda x, y: -0.5 + 0.0 * y, dtype=jnp.float32)
    assert not op.is_symmetric
    planes = V._flat_coef(op)
    assert planes.shape[0] == 9
    return jnp.asarray(u), jnp.asarray(b), op, planes


@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
def test_nonsym_var_smooth_matches_op(smoother):
    S, n = 256, 250
    u, b, op, planes = _setup(S, n)
    with pltpu.force_tpu_interpret_mode():
        got = V.var_smooth(u, b, planes, n, 2, smoother)
    want = op.smooth(u, b, smoother=smoother, omega=2 / 3, sweeps=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_nonsym_var_smooth_residual_matches_op():
    S, n = 256, 250
    u, b, op, planes = _setup(S, n, seed=1)
    with pltpu.force_tpu_interpret_mode():
        gu, gr = V.var_smooth_residual(u, b, planes, n, 2)
    wu = op.smooth(u, b, smoother="jacobi", omega=2 / 3, sweeps=2)
    wr = op.residual(wu, b)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
def test_nonsym_k1v_k2v_match_unfused(smoother):
    S, Sc, n = 256, 128, 250
    u, b, op, planes = _setup(S, n, seed=2)
    rng = np.random.default_rng(3)
    nc = n // 2
    ec = np.zeros((Sc, Sc), np.float32)
    ec[1:nc, 1:nc] = rng.standard_normal((nc - 1, nc - 1))
    ec = jnp.asarray(ec)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = VT.var_smooth_restrict_fused(u, b, planes, n, Sc, 2,
                                               smoother)
        g2 = VT.var_prolong_smooth_fused(u, b, ec, planes, n, 2, smoother)
    wu = op.smooth(u, b, smoother=smoother, omega=2 / 3, sweeps=2)
    wrc = ops.restrict_fw(op.residual(wu, b), n, Sc)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc),
                               rtol=2e-5, atol=2e-5)
    w2 = ops.mask_interior(u + ops.prolong(ec, nc, S), n)
    w2 = op.smooth(w2, b, smoother=smoother, omega=2 / 3, sweeps=2)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(w2),
                               rtol=2e-5, atol=2e-5)


def _solve_pair(use_pallas):
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32, smoother="rbgs",
                          use_pallas=use_pallas)
    return mg.solve_convection_diffusion(
        6, eps=0.01, bx=1.0, by=-0.3, config=cfg, tol=1e-4,
        max_cycles=30)


@pytest.mark.slow
def test_nonsym_fused_solve_trajectory_matches_jnp():
    """until-tol trajectory parity above the f32 residual floor: the
    fused path must engage (the is_symmetric bail is gone) and
    reproduce the jnp path's convergence.  (Below ~1e-5 relative the
    two stall at slightly different floors — the kernel inverts the
    streamed diagonal in-VMEM while the jnp op uses the precomputed
    inverse, an ulp-level difference that dominates only at the floor.)
    """
    with pltpu.force_tpu_interpret_mode():
        fused = _solve_pair(True)
        jax.block_until_ready(fused.u)
    plain = _solve_pair(False)
    assert bool(fused.converged) and bool(plain.converged)
    hf = np.asarray(fused.res_history)
    hp = np.asarray(plain.res_history)
    m = min(np.isfinite(hf).sum(), np.isfinite(hp).sum())
    assert m >= 4
    np.testing.assert_allclose(hf[: m - 1] / hf[0], hp[: m - 1] / hp[0],
                               rtol=2e-3)
    # deepest entry: f32 roundoff is a larger fraction of the value
    np.testing.assert_allclose(hf[m - 1] / hf[0], hp[m - 1] / hp[0],
                               rtol=0.1)


@pytest.mark.slow
def test_nonsym_fused_bicgstab():
    """MG-BiCGStab with the fused nonsymmetric operator/preconditioner."""
    from tpu_multigrid.krylov import bicgstab_solve
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32, smoother="rbgs",
                          use_pallas=True)
    prob = ConvectionDiffusionProblem(cfg, eps=0.01, bx=1.0, by=-0.3,
                                      align=256, min_pad_level=0)
    b = prob.rhs()
    with pltpu.force_tpu_interpret_mode():
        res = bicgstab_solve(prob.hierarchy, cfg, b, tol=1e-6,
                             max_iters=25)
        jax.block_until_ready(res.u)
    h = np.asarray(res.res_history)
    h = h[np.isfinite(h)]
    assert bool(res.converged), h
    assert h[-1] / h[0] <= 1e-6


def test_nonsym_gate_engages_kernels():
    """_var_kernel_ok accepts nonsymmetric operators now (the r3 gate is
    gone) and _flat_coef hands the kernels the 9-plane stack."""
    from tpu_multigrid.cycles import _var_kernel_ok
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32, smoother="rbgs",
                          use_pallas=True)
    op = convection_diffusion_op(64, 256, 0.01, 1.0, 0.0,
                                 dtype=jnp.float32)
    assert _var_kernel_ok(op, cfg, jnp.float32, 2)

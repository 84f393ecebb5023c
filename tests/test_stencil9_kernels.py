"""Static 9-point stencil variant of the K1/K2 super-kernels vs the
Const9Op jnp tier (interpret mode on CPU, SURVEY.md §4 tier 5).

The Mehrstellen fourth-order operator (core.operators.Const9Op) rides the
fused super-kernels through compile-time stencil weights
(kernels/stencil._off_app9) — zero stored planes, zero extra HBM traffic
vs the 5-point kernels (a VarStencilOp formulation would stream 9 (S, S)
planes per launch).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid import MultigridConfig
from tpu_multigrid.core import ops
from tpu_multigrid.core.operators import Const9Op
from tpu_multigrid.cycles import _use_super_kernels, cycle
from tpu_multigrid.kernels import transfer as T
from tpu_multigrid.problems.poisson4 import Poisson4Problem

ST = Const9Op.STENCIL


def _grids(S, n, seed=0, scale=0.1):
    rng = np.random.default_rng(seed)
    u = np.zeros((S, S), np.float32)
    b = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = scale * rng.standard_normal((n - 1, n - 1))
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    return jnp.asarray(u), jnp.asarray(b)


CASES = [(512, 500, 384, 250), (768, 700, 512, 350)]


@pytest.mark.parametrize("S,n,Sc,nc", CASES)
@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
def test_k1_stencil9_matches_const9op(S, n, Sc, nc, smoother):
    op = Const9Op(n, S)
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = jax.block_until_ready(T.smooth_restrict(
            u, b, n, Sc, 2, smoother, 2 / 3, stencil=ST))
    wu = op.smooth(u, b, smoother=smoother, omega=2 / 3, sweeps=2)
    wrc = ops.restrict_fw(op.residual(wu, b), n, Sc)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc),
                               rtol=1e-5, atol=1e-5)


def test_k2_stencil9_matches_const9op_with_resnorm():
    S, n, Sc, nc = CASES[0]
    op = Const9Op(n, S)
    u, b = _grids(S, n)
    ec = _grids(Sc, nc, seed=3, scale=0.05)[0]
    with pltpu.force_tpu_interpret_mode():
        g2, gn = jax.block_until_ready(T.prolong_smooth_resnorm(
            u, b, ec, n, 2, "jacobi", 2 / 3, stencil=ST))
    w2 = op.smooth(ops.mask_interior(u + ops.prolong(ec, nc, S), n), b,
                   smoother="jacobi", omega=2 / 3, sweeps=2)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(w2),
                               rtol=1e-5, atol=1e-6)
    want = float(ops.norm2(op.residual(g2, b)))
    assert abs(float(gn) - want) <= 1e-4 * max(want, 1.0)


def test_dispatch_gate_const9():
    cfg = MultigridConfig(finest_level=7, coarsest_level=4,
                          smoother="chebyshev", nu1=3, nu2=2,
                          use_pallas=True)
    p = Poisson4Problem(cfg, align=256, min_pad_level=0)
    h = p.hierarchy
    assert _use_super_kernels(h.levels[0], h.levels[1], cfg, jnp.float32)
    cfg_j = dataclasses.replace(cfg, use_pallas=False)
    assert not _use_super_kernels(h.levels[0], h.levels[1], cfg_j,
                                  jnp.float32)
    # delta-form mixed precision stays off the 9-point path
    cfg_d = dataclasses.replace(cfg, smooth_dtype=jnp.bfloat16)
    assert not _use_super_kernels(h.levels[0], h.levels[1], cfg_d,
                                  jnp.float32)
    # unaligned hierarchy -> geometry gate rejects
    p1 = Poisson4Problem(cfg)
    assert not _use_super_kernels(p1.hierarchy.levels[0],
                                  p1.hierarchy.levels[1], cfg,
                                  jnp.float32)


@pytest.mark.slow
def test_mehrstellen_fused_cycle_matches_jnp_trajectory():
    cfg_f = MultigridConfig(finest_level=8, coarsest_level=5,
                            smoother="chebyshev", nu1=3, nu2=2,
                            use_pallas=True)
    cfg_j = dataclasses.replace(cfg_f, use_pallas=False)
    p = Poisson4Problem(cfg_f, align=256, min_pad_level=0)
    h = p.hierarchy
    b = p.rhs()
    u0 = jnp.zeros((h.levels[0].S,) * 2, jnp.float32)
    uj = u0
    for _ in range(3):
        uj = cycle(h, cfg_j, uj, b)
    step = jax.jit(lambda v: cycle(h, cfg_f, v, b))
    up = u0
    with pltpu.force_tpu_interpret_mode():
        for _ in range(3):
            up = jax.block_until_ready(step(up))
    np.testing.assert_allclose(np.asarray(up), np.asarray(uj),
                               rtol=1e-4, atol=1e-5)

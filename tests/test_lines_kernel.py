"""Fused zebra_x line-relaxation kernel (kernels/lines.py) vs the jnp PCR
path (core.lines.zebra_sweeps), interpret mode.

Covers axis-aligned 5-point anisotropy, rotated tensors (the corner
offline terms), multi-row-tile streaming (small window budget), multi-
sweep temporal blocking, the Galerkin coarse operators a real hierarchy
produces, and the cycle-level use_pallas dispatch.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid import AnisotropicPoissonProblem, MultigridConfig
from tpu_multigrid.core.lines import zebra_sweeps
from tpu_multigrid.cycles import solve_fixed
from tpu_multigrid.kernels import lines as ZL
from tpu_multigrid.problems.anisotropic import anisotropic_poisson_op


def _setup(n, S, angle=0.0, eps=(1.0, 0.05), seed=0):
    rng = np.random.default_rng(seed)
    u = np.zeros((S, S), np.float32)
    b = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1)).astype(np.float32)
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1)).astype(np.float32)
    op = anisotropic_poisson_op(n, S, eps[0], eps[1], angle=angle)
    return jnp.asarray(u), jnp.asarray(b), op


def _run_kernel(u, b, op, sweeps, **kw):
    coef = jnp.asarray(op.coef).reshape(9, op.S, op.S)
    with pltpu.force_tpu_interpret_mode():
        out = ZL.zebra_sweeps_pallas(u, b, coef, op.n, sweeps, **kw)
        jax.block_until_ready(out)
    return np.asarray(out)


@pytest.mark.parametrize("sweeps", [1, 2])
def test_zebra_kernel_matches_jnp_axis_aligned(sweeps):
    n, S = 32, 128
    u, b, op = _setup(n, S)
    got = _run_kernel(u, b, op, sweeps)
    want = np.asarray(zebra_sweeps(op, u, b, sweeps, axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-5)


def test_zebra_kernel_matches_jnp_rotated():
    n, S = 48, 128
    u, b, op = _setup(n, S, angle=math.radians(30), seed=3)
    got = _run_kernel(u, b, op, 1)
    want = np.asarray(zebra_sweeps(op, u, b, 1, axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-5)


@pytest.mark.parametrize("sweeps", [1, 2])
def test_zebra_kernel_multi_tile(sweeps):
    """Small budget forces row-strip tiling with clamped edge windows."""
    n, S = 120, 128
    u, b, op = _setup(n, S, seed=5)
    budget = ZL._NSLAB * S * 4 * (32 + 16 * sweeps)  # a few strips
    tr, hr = ZL._rows_for(S, sweeps, jnp.float32, budget)
    assert 0 < tr < S and hr >= 2 * sweeps
    got = _run_kernel(u, b, op, sweeps, budget=budget)
    want = np.asarray(zebra_sweeps(op, u, b, sweeps, axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-5)


def test_zebra_kernel_on_galerkin_coarse_op():
    """The coarse 9-point Galerkin operators a real hierarchy produces."""
    cfg = MultigridConfig(finest_level=6, coarsest_level=4,
                          smoother="zebra_x", nu1=1, nu2=1)
    prob = AnisotropicPoissonProblem(cfg, eps_x=1.0, eps_y=0.01,
                                     align=128, min_pad_level=0)
    op = prob.hierarchy.levels[1]   # Galerkin R A P, genuinely 9-point
    S, n = op.S, op.n
    rng = np.random.default_rng(7)
    u = np.zeros((S, S), np.float32)
    b = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1)).astype(np.float32)
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1)).astype(np.float32)
    got = _run_kernel(jnp.asarray(u), jnp.asarray(b), op, 1)
    want = np.asarray(zebra_sweeps(op, jnp.asarray(u), jnp.asarray(b),
                                   1, axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-5)


def test_supported_gate():
    assert ZL.supported_zebra(256, 1, jnp.float32)
    assert not ZL.supported_zebra(256, 1, jnp.bfloat16)
    assert not ZL.supported_zebra(130, 1, jnp.float32)   # not mult 128
    assert not ZL.supported_zebra(64, 1, jnp.float32)    # too small


@pytest.mark.slow
def test_cycle_dispatch_matches_jnp():
    """use_pallas=True V-cycle with zebra_x == the jnp path (both in one
    jit program; interpret launches wrapped per CLAUDE.md)."""
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          smoother="zebra_x", nu1=1, nu2=1,
                          use_pallas=False)
    prob = AnisotropicPoissonProblem(cfg, eps_x=1.0, eps_y=0.05,
                                     angle=math.radians(45))
    b = prob.rhs()
    ref = solve_fixed(prob.hierarchy, cfg, b, num_cycles=2)
    pcfg = MultigridConfig(finest_level=6, coarsest_level=3,
                           smoother="zebra_x", nu1=1, nu2=1,
                           use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        got = solve_fixed(prob.hierarchy, pcfg, b, num_cycles=2)
        jax.block_until_ready(got.u)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               rtol=1e-3, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.res_history),
                               np.asarray(ref.res_history), rtol=2e-4)

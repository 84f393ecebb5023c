"""Fused var-coefficient super-kernels K1v/K2v (interpret mode) vs the
unfused jnp path: var smooth + residual + FW restrict, prolong + add + var
smooth (+ fused residual norm)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid.core import ops
from tpu_multigrid.core.operators import diffusion_op, galerkin_coarsen
from tpu_multigrid.kernels import varstencil as V
from tpu_multigrid.kernels import vartransfer as VT


def _setup(S, n, seed=0):
    rng = np.random.default_rng(seed)
    u = np.zeros((S, S), np.float32)
    b = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    cells = jnp.asarray(0.5 + rng.random((n, n)), jnp.float32)
    op = diffusion_op(cells, n, S)
    return jnp.asarray(u), jnp.asarray(b), op


@pytest.mark.parametrize("S,Sc,n", [(256, 128, 250), (512, 256, 500)])
@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
def test_k1v_matches_unfused(S, Sc, n, smoother):
    u, b, op = _setup(S, n)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = VT.var_smooth_restrict_fused(
            u, b, V._flat_coef(op), n, Sc, 2, smoother)
    wu = op.smooth(u, b, smoother=smoother, omega=2 / 3, sweeps=2)
    wrc = ops.restrict_fw(op.residual(wu, b), n, Sc)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("S,Sc,n", [(256, 128, 250), (512, 256, 500)])
@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
def test_k2v_matches_unfused(S, Sc, n, smoother):
    u, b, op = _setup(S, n, seed=1)
    rng = np.random.default_rng(2)
    nc = n // 2
    ec = np.zeros((Sc, Sc), np.float32)
    ec[1:nc, 1:nc] = rng.standard_normal((nc - 1, nc - 1))
    ec = jnp.asarray(ec)
    with pltpu.force_tpu_interpret_mode():
        gu = VT.var_prolong_smooth_fused(
            u, b, ec, V._flat_coef(op), n, 2, smoother)
    wu = ops.mask_interior(u + ops.prolong(ec, nc, S), n)
    wu = op.smooth(wu, b, smoother=smoother, omega=2 / 3, sweeps=2)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=2e-5, atol=2e-5)


def test_k2v_resnorm_matches():
    S, Sc, n = 256, 128, 250
    u, b, op = _setup(S, n, seed=3)
    rng = np.random.default_rng(4)
    nc = n // 2
    ec = np.zeros((Sc, Sc), np.float32)
    ec[1:nc, 1:nc] = rng.standard_normal((nc - 1, nc - 1))
    ec = jnp.asarray(ec)
    with pltpu.force_tpu_interpret_mode():
        gu, gnorm = VT.var_prolong_smooth_resnorm(
            u, b, ec, V._flat_coef(op), n, 2)
    wu = ops.mask_interior(u + ops.prolong(ec, nc, S), n)
    wu = op.smooth(wu, b, smoother="jacobi", omega=2 / 3, sweeps=2)
    wnorm = float(ops.norm2(op.residual(wu, b)))
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=2e-5, atol=2e-5)
    assert abs(float(gnorm) - wnorm) / max(wnorm, 1e-30) < 1e-4


def test_k1v_chebyshev_schedule():
    """Tuple omega (Chebyshev weights) threads through the fused kernel."""
    S, Sc, n = 256, 128, 250
    u, b, op = _setup(S, n, seed=5)
    omegas = ops.chebyshev_omegas(3, 0.4)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = VT.var_smooth_restrict_fused(
            u, b, V._flat_coef(op), n, Sc, 3, "jacobi", omegas)
    wu = op.smooth(u, b, smoother="jacobi", omega=omegas, sweeps=3)
    wrc = ops.restrict_fw(op.residual(wu, b), n, Sc)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc),
                               rtol=2e-5, atol=2e-5)


def test_9pt_galerkin_level_k1v():
    """K1v on a true 9-point Galerkin-coarsened operator."""
    S, Sc, n = 512, 256, 500
    rng = np.random.default_rng(6)
    cells = jnp.asarray(0.5 + rng.random((2 * n, 2 * n)), jnp.float32)
    fine = diffusion_op(cells, 2 * n, 2 * S)
    op = galerkin_coarsen(fine, S)
    u = np.zeros((S, S), np.float32)
    b = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    u, b = jnp.asarray(u), jnp.asarray(b)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = VT.var_smooth_restrict_fused(
            u, b, V._flat_coef(op), n, Sc, 1)
    wu = op.smooth(u, b, smoother="jacobi", omega=2 / 3, sweeps=1)
    wrc = ops.restrict_fw(op.residual(wu, b), n, Sc)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc),
                               rtol=2e-5, atol=2e-5)


def test_supported_gates():
    assert VT.supported(512, 256, 4, jnp.float32)
    assert not VT.supported(512, 256, 4, jnp.float64)
    assert not VT.supported(512, 128, 4, jnp.float32)   # 2*Sc < Sf
    assert not VT.supported(500, 256, 4, jnp.float32)   # Sf % 256
    assert not VT.supported(512, 250, 4, jnp.float32)   # Sc % 128


def test_full_cycle_var_super_kernels_match_jnp():
    """A whole V-cycle through the K1v/K2v dispatch equals the plain-jnp
    cycle on a var-coefficient hierarchy (interpret mode)."""
    import dataclasses
    import jax
    from tpu_multigrid import MultigridConfig
    from tpu_multigrid.core.grids import build_galerkin_hierarchy
    from tpu_multigrid.cycles import cycle, _use_var_super_kernels

    n = 256
    cfg = MultigridConfig(finest_level=8, coarsest_level=6, nu1=2, nu2=2,
                          dtype=jnp.float32, use_pallas=True)
    rng = np.random.default_rng(7)
    cells = jnp.asarray(0.5 + rng.random((n, n)), jnp.float32)
    fine = diffusion_op(cells, n, 512)
    hier = build_galerkin_hierarchy(fine, cfg, align=256, min_pad_level=0)
    assert _use_var_super_kernels(hier.levels[0], hier.levels[1], cfg,
                                  jnp.float32)
    b = np.zeros((512, 512), np.float32)
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    b = jnp.asarray(b)
    u0 = jnp.zeros((512, 512), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = cycle(hier, cfg, u0, b)
    want = cycle(hier, dataclasses.replace(cfg, use_pallas=False), u0, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)

"""3D V-cycle super-kernels (K1₃/K2₃) vs the jnp ops, interpret mode.

tests/test_kernels.py covers the 2D analogues.  Budgets are shrunk to
force multi-tile geometries; `sync` calls `jax.block_until_ready` between
eager interpret launches (interpret-mode dispatch on this 1-core host
races when a previous kernel is still in flight — CLAUDE.md).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid.core import ops3d
from tpu_multigrid.core.ops import chebyshev_omegas
from tpu_multigrid.kernels import transfer3d


N = 32
SHAPE = (48, 48, 128)
SHAPE_C = (32, 32, 128)          # padded beyond Sf/2 (exercises clamps)


def sync(x):
    jax.block_until_ready(x)
    return x


@pytest.fixture
def grids(rng):
    u = np.zeros(SHAPE, np.float32)
    u[1:N, 1:N, 1:N] = rng.standard_normal((N - 1,) * 3)
    b = np.zeros(SHAPE, np.float32)
    b[1:N, 1:N, 1:N] = rng.standard_normal((N - 1,) * 3)
    ec = np.zeros(SHAPE_C, np.float32)
    ec[1:16, 1:16, 1:16] = rng.standard_normal((15,) * 3)
    return jnp.asarray(u), jnp.asarray(b), jnp.asarray(ec)


@pytest.fixture(params=[512 * 1024, 64 * 2 ** 20],
                ids=["tiled", "single-tile"])
def budget(request, monkeypatch):
    monkeypatch.setattr(transfer3d, "WINDOW_BYTES", request.param)
    fns = (transfer3d.smooth_restrict3, transfer3d.prolong_smooth3,
           transfer3d.prolong_smooth_resnorm3)
    for fn in fns:
        fn._clear_cache()
    yield request.param
    for fn in fns:
        fn._clear_cache()


def test_supported_gates():
    f32 = jnp.float32
    assert transfer3d.supported3((272, 272, 384), (144, 144, 256), 3, f32)
    assert not transfer3d.supported3((272, 272, 384), (144, 144, 256), 3,
                                     jnp.float64)
    assert not transfer3d.supported3((264, 264, 384), (144, 144, 256), 3,
                                     f32)               # Sy % 16
    assert not transfer3d.supported3((272, 272, 384), (120, 144, 256), 3,
                                     f32)               # 2*Szc < Sz
    assert not transfer3d.supported3((272, 272, 384), (144, 144, 256), 15,
                                     f32)               # halo bound


def test_k1_smooth_restrict(grids, budget):
    u, b, _ = grids
    with pltpu.force_tpu_interpret_mode():
        gu, grc = sync(transfer3d.smooth_restrict3(
            u, b, N, SHAPE_C, 3, "jacobi", 2.0 / 3.0))
    wu = ops3d.jacobi_sweeps3(u, b, N, 2.0 / 3.0, 3)
    wrc = ops3d.restrict_fw3(ops3d.residual3(wu, b, N), N, SHAPE_C)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=2e-6)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc), atol=1e-5)


def test_k1_chebyshev_rbgs(grids, budget):
    u, b, _ = grids
    om = chebyshev_omegas(2)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = sync(transfer3d.smooth_restrict3(
            u, b, N, SHAPE_C, 2, "jacobi", om))
        gu2, grc2 = sync(transfer3d.smooth_restrict3(
            u, b, N, SHAPE_C, 1, "rbgs", 0.0))
    wu = ops3d.jacobi_sweeps3(u, b, N, om, 2)
    wrc = ops3d.restrict_fw3(ops3d.residual3(wu, b, N), N, SHAPE_C)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=2e-6)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc), atol=1e-5)
    wu2 = ops3d.redblack_gs_sweeps3(u, b, N, 1)
    wrc2 = ops3d.restrict_fw3(ops3d.residual3(wu2, b, N), N, SHAPE_C)
    np.testing.assert_allclose(np.asarray(gu2), np.asarray(wu2), atol=2e-6)
    np.testing.assert_allclose(np.asarray(grc2), np.asarray(wrc2),
                               atol=1e-5)


def test_k2_prolong_smooth(grids, budget):
    u, b, ec = grids
    with pltpu.force_tpu_interpret_mode():
        gu = sync(transfer3d.prolong_smooth3(
            u, b, ec, N, 2, "jacobi", 2.0 / 3.0))
    wu = ops3d.jacobi_sweeps3(u + ops3d.prolong3(ec, N // 2, SHAPE),
                              b, N, 2.0 / 3.0, 2)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=2e-6)


def test_k2_resnorm(grids, budget):
    u, b, ec = grids
    with pltpu.force_tpu_interpret_mode():
        gu, gn = sync(transfer3d.prolong_smooth_resnorm3(
            u, b, ec, N, 2, "jacobi", 2.0 / 3.0))
    wu = ops3d.jacobi_sweeps3(u + ops3d.prolong3(ec, N // 2, SHAPE),
                              b, N, 2.0 / 3.0, 2)
    wn = float(jnp.sqrt(jnp.sum(
        ops3d.residual3(wu, b, N).astype(jnp.float32) ** 2)))
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=2e-6)
    assert abs(float(gn) - wn) / wn < 1e-5


def test_fused_cycle_matches_jnp():
    """cycles.cycle with the K1₃/K2₃ branches active (wide-enough Sx)."""
    from tpu_multigrid import MultigridConfig
    from tpu_multigrid.problems import Poisson3DProblem
    from tpu_multigrid import cycles

    cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                          smoother="chebyshev", nu1=3, nu2=2,
                          dtype=jnp.float32, use_pallas=True)
    prob = Poisson3DProblem(cfg, align=16, min_pad_level=0, lane_align=128)
    op, opc = prob.hierarchy.levels[0], prob.hierarchy.levels[1]
    # Sx = 128 at level 5, so the gate must route to the plain kernels
    assert not cycles._use_super_kernels3(op, opc, cfg, jnp.float32)
    b = prob.rhs()
    u0 = jnp.zeros_like(b)
    # One jitted program per interpret call: EAGER cycles under interpret
    # mode dispatch hundreds of ops that race interpret's device-barrier
    # io_callbacks on this 1-core host (observed suite hangs with the
    # main thread mid-trace and a callback thread stuck in
    # update_clocks_for_device_barrier).
    run_cycle = jax.jit(lambda h, u, bb: cycles.cycle(h, cfg, u, bb))
    run_norm = jax.jit(
        lambda h, u, bb: cycles.cycle_with_norm(h, cfg, u, bb))
    with pltpu.force_tpu_interpret_mode():
        up = sync(run_cycle(prob.hierarchy, u0, b))
        upn, nn = sync(run_norm(prob.hierarchy, u0, b))
    cfgj = dataclasses.replace(cfg, use_pallas=False)
    uj = cycles.cycle(prob.hierarchy, cfgj, u0, b)
    wn = float(jnp.sqrt(jnp.sum(ops3d.residual3(
        uj, b, op.n).astype(jnp.float32) ** 2)))
    np.testing.assert_allclose(np.asarray(up), np.asarray(uj), atol=2e-6)
    np.testing.assert_allclose(np.asarray(upn), np.asarray(uj), atol=2e-6)
    assert abs(float(nn) - wn) / wn < 1e-4


def test_fused_cycle_super_kernels_in_trace(monkeypatch):
    """With a wide grid the super-kernel branch fires (traced check only —
    interpret execution at that size is too slow for CI)."""
    from tpu_multigrid import MultigridConfig
    from tpu_multigrid.problems import Poisson3DProblem
    from tpu_multigrid import cycles

    cfg = MultigridConfig(finest_level=8, coarsest_level=6,
                          smoother="chebyshev", nu1=3, nu2=2,
                          coarse_solver="smooth",  # 63³ dense inverse is
                          dtype=jnp.float32, use_pallas=True)  # infeasible
    prob = Poisson3DProblem(cfg, align=16, min_pad_level=0, lane_align=128)
    op, opc = prob.hierarchy.levels[0], prob.hierarchy.levels[1]
    assert cycles._use_super_kernels3(op, opc, cfg, jnp.float32)
    b = jax.ShapeDtypeStruct(op.grid_shape, jnp.float32)
    jaxpr = str(jax.make_jaxpr(
        lambda h, u, bb: cycles.cycle(h, cfg, u, bb))(prob.hierarchy, b, b))
    assert "pallas_call" in jaxpr

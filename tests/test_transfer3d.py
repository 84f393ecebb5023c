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


@pytest.mark.parametrize("smoother,sweeps", [("jacobi", 3), ("rbgs", 2)])
def test_y_core_shrink_two_axis_tiling(monkeypatch, rng, smoother, sweeps):
    """Two-axis (z, y) tiling with the y-core shrink ENGAGED
    (transfer3d._core_y: KWY < WY): the production budgets only reach this
    regime at chip-scale grids, so shrink WINDOW_BYTES until _tiles_k1
    picks HY=16 with a tileable ty, and pin K1₃/K2₃ against the jnp ops.
    """
    n2 = 64
    shape = (96, 96, 128)
    shape_c = (48, 48, 128)
    monkeypatch.setattr(transfer3d, "WINDOW_BYTES", 614400)
    for fn in (transfer3d.smooth_restrict3, transfer3d.prolong_smooth3):
        fn._clear_cache()
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    TZ, HZ, TY, HY = transfer3d._tiles_k1(shape, steps + 2, jnp.float32)
    assert HY == 16 and TY < 96, (TZ, HZ, TY, HY)
    CHY, KWY = transfer3d._core_y(TY, TY + 2 * HY, steps)
    assert KWY < TY + 2 * HY, "core shrink must engage for this test"

    u = np.zeros(shape, np.float32)
    u[1:n2, 1:n2, 1:n2] = rng.standard_normal((n2 - 1,) * 3)
    b = np.zeros(shape, np.float32)
    b[1:n2, 1:n2, 1:n2] = rng.standard_normal((n2 - 1,) * 3)
    ec = np.zeros(shape_c, np.float32)
    ec[1:n2 // 2, 1:n2 // 2, 1:n2 // 2] = rng.standard_normal(
        (n2 // 2 - 1,) * 3)
    u, b, ec = jnp.asarray(u), jnp.asarray(b), jnp.asarray(ec)

    with pltpu.force_tpu_interpret_mode():
        gu, grc = sync(transfer3d.smooth_restrict3(
            u, b, n2, shape_c, sweeps, smoother, 2.0 / 3.0))
    if smoother == "rbgs":
        wu = ops3d.redblack_gs_sweeps3(u, b, n2, sweeps)
    else:
        wu = ops3d.jacobi_sweeps3(u, b, n2, 2.0 / 3.0, sweeps)
    wrc = ops3d.restrict_fw3(ops3d.residual3(wu, b, n2), n2, shape_c)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=2e-6)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc), atol=1e-5)

    with pltpu.force_tpu_interpret_mode():
        gu2 = sync(transfer3d.prolong_smooth3(
            u, b, ec, n2, sweeps, smoother, 2.0 / 3.0))
    corrected = u + ops3d.prolong3(ec, n2 // 2, shape)
    if smoother == "rbgs":
        wu2 = ops3d.redblack_gs_sweeps3(corrected, b, n2, sweeps)
    else:
        wu2 = ops3d.jacobi_sweeps3(corrected, b, n2, 2.0 / 3.0, sweeps)
    np.testing.assert_allclose(np.asarray(gu2), np.asarray(wu2), atol=2e-6)
    for fn in (transfer3d.smooth_restrict3, transfer3d.prolong_smooth3):
        fn._clear_cache()


def test_local3_kernels_direct_y_core(monkeypatch, rng):
    """Extended-block (distributed) K1₃/K2₃ called DIRECTLY (no shard_map
    — the kernels are shard-agnostic, the global origin is an argument)
    on a whole-domain shard, with the budget shrunk so two-axis tiling +
    the y-core shrink engage inside the LOCAL kernel bodies (the sharded
    interpret tests only reach full-extent windows)."""
    n2 = 64
    GZ = GY = 16
    S, Sx = 96, 128
    monkeypatch.setattr(transfer3d, "WINDOW_BYTES", 614400)
    transfer3d.smooth_restrict_ext3._clear_cache()
    transfer3d.prolong_smooth_ext3._clear_cache()
    shape_ext = (S + 2 * GZ, S + 2 * GY, Sx)
    TZ, HZ, TY, HY = transfer3d._tiles_k1(shape_ext, 5, jnp.float32)
    assert HY == 16, (TZ, HZ, TY, HY)
    assert transfer3d._core_y(TY, TY + 2 * HY, 3)[1] < TY + 2 * HY

    u = np.zeros((S, S, Sx), np.float32)
    u[1:n2, 1:n2, 1:n2] = rng.standard_normal((n2 - 1,) * 3)
    b = np.zeros((S, S, Sx), np.float32)
    b[1:n2, 1:n2, 1:n2] = rng.standard_normal((n2 - 1,) * 3)
    Sc = S // 2
    ec = np.zeros((Sc, Sc, Sx), np.float32)
    ec[1:n2 // 2, 1:n2 // 2, 1:n2 // 2] = rng.standard_normal(
        (n2 // 2 - 1,) * 3)

    def extend(a, g):
        out = np.zeros((a.shape[0] + 2 * g, a.shape[1] + 2 * g, a.shape[2]),
                       np.float32)
        out[g:-g, g:-g] = a
        return jnp.asarray(out)

    u_ext, b_ext = extend(u, GZ), extend(b, GZ)
    # Coarse extended block: fine local l <-> coarse l/2 + GZ/2, total
    # extent Rz//2 + GZ (supported_local3) — owned coarse sits at
    # [GZ : GZ + Sc].
    ec_ext = extend(ec, GZ)
    origin = jnp.asarray([[-GZ, -GY]], jnp.int32)
    shape_lc = ((S + 2 * GZ) // 2 + GZ, (S + 2 * GY) // 2 + GY, Sx)

    with pltpu.force_tpu_interpret_mode():
        gu, grc = sync(transfer3d.smooth_restrict_ext3(
            u_ext, b_ext, origin, n2, shape_lc, 3, "jacobi", 2.0 / 3.0,
            ghost=(GZ, GY)))
    uj, bj = jnp.asarray(u), jnp.asarray(b)
    wu = ops3d.jacobi_sweeps3(uj, bj, n2, 2.0 / 3.0, 3)
    wrc = ops3d.restrict_fw3(ops3d.residual3(wu, bj, n2), n2,
                             (Sc, Sc, Sx))
    np.testing.assert_allclose(np.asarray(gu)[GZ:-GZ, GY:-GY],
                               np.asarray(wu), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(grc)[GZ:GZ + Sc, GY:GY + Sc],
        np.asarray(wrc), atol=1e-5)

    with pltpu.force_tpu_interpret_mode():
        gu2, gss = sync(transfer3d.prolong_smooth_ext3(
            u_ext, b_ext, ec_ext, origin, n2, 2, "jacobi", 2.0 / 3.0,
            ghost=(GZ, GY), want_resnorm=True))
    corrected = uj + ops3d.prolong3(jnp.asarray(ec), n2 // 2, (S, S, Sx))
    wu2 = ops3d.jacobi_sweeps3(corrected, bj, n2, 2.0 / 3.0, 2)
    np.testing.assert_allclose(np.asarray(gu2)[GZ:-GZ, GY:-GY],
                               np.asarray(wu2), atol=2e-6)
    wss = float(np.sum(np.asarray(ops3d.residual3(wu2, bj, n2),
                                  np.float64) ** 2))
    np.testing.assert_allclose(float(gss), wss, rtol=1e-4)
    transfer3d.smooth_restrict_ext3._clear_cache()
    transfer3d.prolong_smooth_ext3._clear_cache()


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

"""Pallas kernel tests vs the jnp reference ops, in interpret mode on CPU
(SURVEY.md §4 tier 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid.core import ops
from tpu_multigrid.kernels import stencil as K


def _grids(S, n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    u = np.zeros((S, S), np.float32)
    b = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    return jnp.asarray(u, dtype), jnp.asarray(b, dtype)


# Sizes exercise: multi-tile rows, full-width strips, single-window edge
# clamping, and non-(n+1) padding.
CASES = [(256, 250), (640, 632), (640, 639), (1280, 1200)]


@pytest.mark.parametrize("S,n", CASES)
@pytest.mark.parametrize("sweeps", [1, 3])
def test_pallas_jacobi_matches_ops(S, n, sweeps):
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        got = K.jacobi_sweeps(u, b, n, 2 / 3, sweeps)
    want = ops.jacobi_sweeps(u, b, n, 2 / 3, sweeps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S,n", CASES)
def test_pallas_jacobi_residual_matches_ops(S, n):
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        gu, gr = K.jacobi_sweeps_residual(u, b, n, 2 / 3, 2)
    wu = ops.jacobi_sweeps(u, b, n, 2 / 3, 2)
    wr = ops.residual(wu, b, n)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S,n", [(256, 250), (640, 632)])
@pytest.mark.parametrize("sweeps", [1, 2])
def test_pallas_rbgs_matches_ops(S, n, sweeps):
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        got = K.rbgs_sweeps(u, b, n, sweeps)
    want = ops.redblack_gs_sweeps(u, b, n, sweeps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S,n", [(256, 250), (640, 639)])
def test_pallas_residual_matches_ops(S, n):
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        got = K.residual(u, b, n)
    want = ops.residual(u, b, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_supported_gates():
    assert not K.supported(255, jnp.float32)     # not 128-multiple
    assert not K.supported(130, jnp.float32)     # too small
    assert not K.supported(8320, jnp.float64)    # unsupported dtype
    assert K.supported(8320, jnp.float32)
    assert K.supported(256, jnp.bfloat16)


def test_pallas_bf16_jacobi():
    S, n = 256, 250
    u, b = _grids(S, n, dtype=jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = K.jacobi_sweeps(u, b, n, 2 / 3, 2)
    want = ops.jacobi_sweeps(u, b, n, 2 / 3, 2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


# ---------------------------------------------------------------------------
# Fused V-cycle super-kernels (kernels/transfer.py)
# ---------------------------------------------------------------------------

from tpu_multigrid.kernels import transfer as T


SUPER_CASES = [(768, 512, 512), (768, 512, 700), (1280, 768, 1024)]


@pytest.mark.parametrize("S,Sc,n", SUPER_CASES)
@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
def test_smooth_restrict_matches_composition(S, Sc, n, smoother):
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = T.smooth_restrict(u, b, n, Sc, 2, smoother=smoother)
    if smoother == "jacobi":
        wu = ops.jacobi_sweeps(u, b, n, 2 / 3, 2)
    else:
        wu = ops.redblack_gs_sweeps(u, b, n, 2)
    wrc = ops.restrict_fw(ops.residual(wu, b, n), n, Sc)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S,Sc,n", SUPER_CASES)
@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
def test_prolong_smooth_matches_composition(S, Sc, n, smoother):
    u, b = _grids(S, n)
    nc = n // 2
    rng = np.random.default_rng(7)
    e = np.zeros((Sc, Sc), np.float32)
    e[1:nc, 1:nc] = rng.standard_normal((nc - 1, nc - 1))
    e = jnp.asarray(e)
    with pltpu.force_tpu_interpret_mode():
        gu = T.prolong_smooth(u, b, e, n, 2, smoother=smoother)
    corrected = u + ops.prolong(e, nc, S)
    if smoother == "jacobi":
        wu = ops.jacobi_sweeps(corrected, b, n, 2 / 3, 2)
    else:
        wu = ops.redblack_gs_sweeps(corrected, b, n, 2)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=1e-5, atol=1e-5)


def test_smooth_restrict_zero_sweeps_is_pure_restrict():
    S, Sc, n = 768, 512, 512
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = T.smooth_restrict(u, b, n, Sc, 0)
    wrc = ops.restrict_fw(ops.residual(u, b, n), n, Sc)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(u),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc),
                               rtol=1e-5, atol=1e-5)


def test_transfer_supported_gates():
    assert T.supported(768, 512, 4, jnp.float32)
    assert T.supported(256, 256, 4, jnp.float32)       # full hierarchy cover
    assert not T.supported(768, 512, 4, jnp.float64)
    # bf16 is supported with the deeper (32-row) halo geometry
    assert T.supported(768, 512, 4, jnp.bfloat16)
    assert not T.supported(768, 512, 31, jnp.bfloat16)  # halo bound
    assert not T.supported(640, 512, 4, jnp.float32)   # Sf not mult 256
    assert not T.supported(768, 256, 4, jnp.float32)   # coarse too small
    assert not T.supported(128, 128, 4, jnp.float32)   # below min size
    assert not T.supported(8448, 4352, 15, jnp.float32)  # halo too shallow


@pytest.mark.parametrize("smoother,steps", [("jacobi", 2), ("rbgs", 4),
                                            ("jacobi", 7)])
def test_super_kernels_column_tiled_core_shrink(monkeypatch, smoother,
                                                steps):
    """Column-TILED windows (kc0 in {0, 128, 256}) through the compute-core
    shrink (transfer._core_geom): the production column-tile path only
    engages at S >= TC + 512, far too big for interpret mode, so narrow TC
    to force multi-column tiling at S=1280.  steps=7 exceeds the row-core
    contamination budget (steps + 2 > hr//2 = 8) and must take the
    row-fallback (CHr == hr) while still column-shrinking."""
    S, Sc, n = 1280, 768, 1024
    monkeypatch.setattr(T, "TC", 256)
    assert T._geom(S, jnp.float32) == (256, 256, 16, 256)
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = T._smooth_restrict(u, b, n=n, Sc=Sc, steps=steps,
                                     smoother=smoother, omega=2 / 3)
    if smoother == "rbgs":
        wu = ops.redblack_gs_sweeps(u, b, n, steps // 2)
    else:
        wu = ops.jacobi_sweeps(u, b, n, 2 / 3, steps)
    wrc = ops.restrict_fw(ops.residual(wu, b, n), n, Sc)
    half = S // 2
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grc)[:half, :half],
                               np.asarray(wrc)[:half, :half],
                               rtol=1e-5, atol=1e-5)

    nc = n // 2
    rng = np.random.default_rng(7)
    e = np.zeros((Sc, Sc), np.float32)
    e[1:nc, 1:nc] = rng.standard_normal((nc - 1, nc - 1))
    e = jnp.asarray(e)
    with pltpu.force_tpu_interpret_mode():
        gu2, gss = T._prolong_smooth(u, b, e, n=n, steps=steps,
                                     smoother=smoother, omega=2 / 3,
                                     want_resnorm=True)
    corrected = u + ops.prolong(e, nc, S)
    if smoother == "rbgs":
        wu2 = ops.redblack_gs_sweeps(corrected, b, n, steps // 2)
    else:
        wu2 = ops.jacobi_sweeps(corrected, b, n, 2 / 3, steps)
    np.testing.assert_allclose(np.asarray(gu2), np.asarray(wu2),
                               rtol=1e-5, atol=1e-5)
    wss = float(ops.norm2(ops.residual(wu2, b, n))) ** 2
    np.testing.assert_allclose(float(gss[0, 0]), wss, rtol=1e-4)


def test_delta_form_bf16_smoothing_on_fused_tier():
    """BASELINE config 3 (bf16 smoothing) through the super-kernels
    (kernels/transfer.py::_delta_steps): the fused delta-form cycle must
    match the unfused delta-form cycle (cycles._smooth), which previously
    was the ONLY path smooth_dtype=bf16 could take."""
    import dataclasses
    import jax
    from tpu_multigrid import MultigridConfig, PoissonProblem
    from tpu_multigrid.cycles import _use_super_kernels, cycle_with_norm

    cfg_j = MultigridConfig(finest_level=9, coarsest_level=4,
                            dtype=jnp.float32, smooth_dtype=jnp.bfloat16,
                            use_pallas=False)
    cfg_p = dataclasses.replace(cfg_j, use_pallas=True)
    prob = PoissonProblem(cfg_p, align=256, min_pad_level=8)
    hier = prob.hierarchy
    assert _use_super_kernels(hier.levels[0], hier.levels[1], cfg_p,
                              jnp.dtype(jnp.float32))
    b = prob.rhs()
    u0 = jnp.zeros_like(b)
    u_j, n_j = cycle_with_norm(hier, cfg_j, u0, b)
    with pltpu.force_tpu_interpret_mode():
        u_p, n_p = cycle_with_norm(hier, cfg_p, u0, b)
    # bf16 sweep registers: tolerances at the bf16 rounding scale.
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_j),
                               rtol=5e-2, atol=1e-4 * float(n_j))
    np.testing.assert_allclose(float(n_p), float(n_j), rtol=5e-2)


def test_full_pallas_vcycle_matches_jnp_cycle_interpret():
    """Whole-cycle equivalence: use_pallas=True vs False on one V-cycle."""
    import jax
    from tpu_multigrid import MultigridConfig, PoissonProblem, cycle

    cfgs = [MultigridConfig(finest_level=9, coarsest_level=3,
                            dtype=jnp.float32, use_pallas=p)
            for p in (False, True)]
    prob = PoissonProblem(cfgs[0], align=256, min_pad_level=8)
    b = prob.rhs()
    u0 = jnp.zeros_like(b)
    outs = []
    for cfg in cfgs:
        with pltpu.force_tpu_interpret_mode():
            outs.append(cycle(prob.hierarchy, cfg, u0, b))
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(outs[0]),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("S,Sc,n", SUPER_CASES)
def test_standalone_restrict_pallas(S, Sc, n):
    u, b = _grids(S, n)
    with pltpu.force_tpu_interpret_mode():
        got = T.restrict_fw_pallas(u, n, Sc)
    want = ops.restrict_fw(u, n, Sc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S,Sc,n", SUPER_CASES)
def test_standalone_prolong_add_pallas(S, Sc, n):
    u, _ = _grids(S, n)
    nc = n // 2
    rng = np.random.default_rng(5)
    e = np.zeros((Sc, Sc), np.float32)
    e[1:nc, 1:nc] = rng.standard_normal((nc - 1, nc - 1))
    e = jnp.asarray(e)
    with pltpu.force_tpu_interpret_mode():
        got = T.prolong_add_pallas(u, e, n)
    want = ops.mask_interior(u + ops.prolong(e, nc, S), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_supported_bounds_sweep_depth():
    """supported() must reject temporal-blocking depths the fixed column
    halo / row tile cannot honor (ADVICE r1: stencil.py did not bound the
    sweep count, silently corrupting columns near tile seams)."""
    f32 = jnp.float32
    # Normal depths pass.
    assert K.supported(256, f32, 1)
    assert K.supported(1280, f32, 21)
    # Column-tiled grids (S >= TILE_C + 2*COL_HALO) cap at COL_HALO steps.
    S_wide = K.TILE_C + 2 * K.COL_HALO
    assert K.supported(S_wide, f32, K.COL_HALO)
    assert not K.supported(S_wide, f32, K.COL_HALO + 1)
    # Row tile must stay positive: S=256 with a huge halo fails.
    assert not K.supported(256, f32, 130)
    # Unsupported dtype.
    assert not K.supported(256, jnp.float64, 1)


def test_deep_sweeps_fall_back_to_jnp_correctly():
    """A smooth whose depth exceeds the kernel's halo must produce the same
    result as the jnp path (the cycle falls back instead of corrupting)."""
    from tpu_multigrid import MultigridConfig, PoissonProblem
    from tpu_multigrid.cycles import _smooth_raw

    cfg = MultigridConfig(finest_level=7, coarsest_level=3,
                          dtype=jnp.float32, use_pallas=True, nu1=140)
    prob = PoissonProblem(cfg, align=256, min_pad_level=0)
    op = prob.hierarchy.levels[0]
    assert op.S == 256  # row tile collapses at this depth -> must fall back
    u, b = _grids(op.S, op.n, seed=3)
    assert not K.supported(op.S, jnp.float32, 140)
    with pltpu.force_tpu_interpret_mode():
        got = _smooth_raw(op, u, b, cfg, 140)
    want = ops.jacobi_sweeps(u, b, op.n, cfg.omega, 140)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("S,Sc,n", [(512, 384, 500), (768, 384, 512)])
def test_prolong_comp_pallas_exact_pair(S, Sc, n):
    """Streamed compensated prolongation: hi + err == P e_c exactly in f64
    (kernel twin of precision.prolong_comp, for 16385^2-scale ds cycles)."""
    from tpu_multigrid.kernels import transfer as T2
    nc = n // 2
    rng = np.random.default_rng(7)
    e = np.zeros((Sc, Sc), np.float32)
    e[1:nc, 1:nc] = rng.standard_normal((nc - 1, nc - 1))
    e = jnp.asarray(e)
    with pltpu.force_tpu_interpret_mode():
        hi, err = T2.prolong_comp_pallas(e, n, S)
    want = np.asarray(ops.prolong(jnp.asarray(np.asarray(e), jnp.float64),
                                  nc, S))
    got = np.asarray(hi, np.float64) + np.asarray(err, np.float64)
    assert np.abs(got - want).max() == 0.0


@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
def test_super_kernels_bf16(smoother):
    """bf16 K1/K2 (32-row halo geometry) match the jnp composition to bf16
    roundoff in interpret mode (BASELINE config 3 kernel capability)."""
    S, Sc, n = 768, 512, 700
    u, b = _grids(S, n, dtype=jnp.bfloat16)
    assert T.supported(S, Sc, 4, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = T.smooth_restrict(u, b, n, Sc, 2, smoother=smoother)
    if smoother == "jacobi":
        wu = ops.jacobi_sweeps(u, b, n, 2 / 3, 2)
    else:
        wu = ops.redblack_gs_sweeps(u, b, n, 2)
    wrc = ops.restrict_fw(ops.residual(wu, b, n), n, Sc)
    np.testing.assert_allclose(np.asarray(gu, np.float32),
                               np.asarray(wu, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(grc, np.float32),
                               np.asarray(wrc, np.float32),
                               rtol=0.05, atol=0.05)
    nc = n // 2
    rng = np.random.default_rng(5)
    e = np.zeros((Sc, Sc), np.float32)
    e[1:nc, 1:nc] = rng.standard_normal((nc - 1, nc - 1))
    e = jnp.asarray(e, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        gu2 = T.prolong_smooth(u, b, e, n, 2, smoother=smoother)
    corrected = ops.mask_interior(
        (u + ops.prolong(e, nc, S)).astype(jnp.bfloat16), n)
    if smoother == "jacobi":
        w2 = ops.jacobi_sweeps(corrected, b, n, 2 / 3, 2)
    else:
        w2 = ops.redblack_gs_sweeps(corrected, b, n, 2)
    np.testing.assert_allclose(np.asarray(gu2, np.float32),
                               np.asarray(w2, np.float32),
                               rtol=0.05, atol=0.05)

"""Fused zebra level-visit super-kernels (kernels/lines.py K1z/K2z) vs the
unfused jnp path, interpret mode.

K1z = zebra sweeps + 9-point residual + FW restrict; K2z = bilinear
prolong + add + zebra sweeps (+ fused residual norm).  Covers axis-aligned
and rotated operators, multi-row-strip streaming, the resnorm claim mask
on clipped edge tiles, and the cycle-level dispatch.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid import AnisotropicPoissonProblem, MultigridConfig
from tpu_multigrid.core import ops
from tpu_multigrid.core.lines import zebra_sweeps
from tpu_multigrid.cycles import solve_fixed, solve_until_tol
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


def _coef(op):
    return jnp.asarray(op.coef).reshape(9, op.S, op.S)


def _k1_ref(op, u, b, sweeps, Sc):
    u1 = zebra_sweeps(op, u, b, sweeps, axis=1)
    r = op.residual(u1, b)
    return np.asarray(u1), np.asarray(ops.restrict_fw(r, op.n, Sc))


class TestK1z:
    @pytest.mark.parametrize("sweeps", [1, 2])
    def test_matches_jnp(self, sweeps):
        n, S, Sc = 32, 256, 256
        u, b, op = _setup(n, S)
        with pltpu.force_tpu_interpret_mode():
            got_u, got_rc = ZL.zebra_smooth_restrict(u, b, _coef(op), n,
                                                     Sc, sweeps)
            jax.block_until_ready(got_u)
        want_u, want_rc = _k1_ref(op, u, b, sweeps, Sc)
        np.testing.assert_allclose(np.asarray(got_u), want_u, rtol=1e-3,
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(got_rc), want_rc, rtol=1e-3,
                                   atol=5e-5)

    def test_rotated_multi_tile(self):
        """Rotated tensor (all 9 planes live) + forced row strips."""
        n, S, Sc = 200, 256, 256
        u, b, op = _setup(n, S, angle=math.radians(30), seed=3)
        budget = ZL._NSLAB_K1 * S * 4 * 96   # wr=96 -> tr=64, 4 strips
        tr, hr = ZL._rows_for_fused(S, 1, jnp.float32, budget,
                                    ZL._NSLAB_K1)
        assert 0 < tr < S and hr == ZL._HR_FUSED
        with pltpu.force_tpu_interpret_mode():
            got_u, got_rc = ZL.zebra_smooth_restrict(u, b, _coef(op), n,
                                                     Sc, 1, budget=budget)
            jax.block_until_ready(got_u)
        want_u, want_rc = _k1_ref(op, u, b, 1, Sc)
        np.testing.assert_allclose(np.asarray(got_u), want_u, rtol=1e-3,
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(got_rc), want_rc, rtol=1e-3,
                                   atol=5e-5)


class TestK2z:
    @pytest.mark.parametrize("sweeps", [1, 2])
    def test_matches_jnp(self, sweeps):
        n, S, Sc = 32, 256, 256
        u, b, op = _setup(n, S)
        nc = n // 2
        rng = np.random.default_rng(11)
        ec = np.zeros((Sc, Sc), np.float32)
        ec[1:nc, 1:nc] = rng.standard_normal((nc - 1, nc - 1)) \
            .astype(np.float32)
        ec = jnp.asarray(ec)
        with pltpu.force_tpu_interpret_mode():
            got = ZL.prolong_zebra_smooth(u, b, ec, _coef(op), n, sweeps)
            jax.block_until_ready(got)
        u2 = u + ops.prolong(ec, nc, S)
        want = np.asarray(zebra_sweeps(op, u2, b, sweeps, axis=1))
        np.testing.assert_allclose(np.asarray(got)[1:n, 1:n],
                                   want[1:n, 1:n], rtol=1e-3, atol=5e-5)
        # exterior stays exactly zero (the architecture invariant)
        mask = np.ones((S, S), bool)
        mask[1:n, 1:n] = False
        assert np.all(np.asarray(got)[mask] == 0.0)

    def test_resnorm_multi_tile(self):
        """Fused residual norm == ||b - A u'|| with clipped edge tiles
        (the claim mask must count every interior row exactly once)."""
        n, S, Sc = 200, 256, 256
        u, b, op = _setup(n, S, seed=7)
        nc = n // 2
        rng = np.random.default_rng(13)
        ec = np.zeros((Sc, Sc), np.float32)
        ec[1:nc, 1:nc] = rng.standard_normal((nc - 1, nc - 1)) \
            .astype(np.float32)
        ec = jnp.asarray(ec)
        budget = ZL._NSLAB_K2 * S * 4 * 96
        with pltpu.force_tpu_interpret_mode():
            got, nrm = ZL.prolong_zebra_smooth_resnorm(u, b, ec, _coef(op),
                                                       n, 1, budget=budget)
            jax.block_until_ready(got)
        u2 = u + ops.prolong(ec, nc, S)
        want = zebra_sweeps(op, u2, b, 1, axis=1)
        np.testing.assert_allclose(np.asarray(got)[1:n, 1:n],
                                   np.asarray(want)[1:n, 1:n],
                                   rtol=1e-3, atol=5e-5)
        want_nrm = float(jnp.linalg.norm(op.residual(want, b)))
        assert abs(float(nrm) - want_nrm) / want_nrm < 1e-3


def test_supported_gate():
    ok = ZL.supported_zebra_fused
    assert ok(256, 256, 2, jnp.float32)
    assert ok(512, 384, 2, jnp.float32)      # 512/2 + 128 = 384
    assert not ok(256, 256, 2, jnp.bfloat16)
    assert not ok(384, 256, 2, jnp.float32)  # S not mult 256
    assert not ok(512, 256, 2, jnp.float32)  # Sc < S/2 + 128
    # full-extent windows (S=256 fits VMEM) have no contamination budget,
    # so deep sweeps pass there; row strips (S=768) gate on 2*s+2 <= 16
    assert ok(256, 256, 8, jnp.float32)
    assert ok(768, 512, 7, jnp.float32)
    assert not ok(768, 512, 8, jnp.float32)  # halo: 2*8+2 > 16


@pytest.mark.slow
def test_zebra_y_auto_transpose_matches_jnp():
    """solve_anisotropic(smoother='zebra_y', use_pallas=True) solves the
    transposed problem on the fused zebra_x tier and transposes back —
    must match the direct jnp zebra_y solve (asymmetric forcing exercises
    the argument swap)."""
    import tpu_multigrid as mg

    forcing = lambda x, y: 4.0 + 3.0 * x - y * y
    kw = dict(eps_x=0.01, eps_y=1.0, coarsening="full", forcing=forcing,
              num_cycles=3, tol=None)
    cfg_j = MultigridConfig(finest_level=6, coarsest_level=4,
                            smoother="zebra_y", nu1=1, nu2=1,
                            use_pallas=False)
    ref = mg.solve_anisotropic(6, config=cfg_j, **kw)
    cfg_p = MultigridConfig(finest_level=6, coarsest_level=4,
                            smoother="zebra_y", nu1=1, nu2=1,
                            use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        got = mg.solve_anisotropic(6, config=cfg_p, **kw)
        jax.block_until_ready(got.u)
    n = 64
    np.testing.assert_allclose(np.asarray(got.u)[:n + 1, :n + 1],
                               np.asarray(ref.u)[:n + 1, :n + 1],
                               rtol=1e-3, atol=5e-5)


@pytest.mark.slow
def test_cycle_dispatch_matches_jnp():
    """use_pallas V-cycles on a 256-aligned zebra hierarchy run the K1z/K2z
    path (gate asserted) and match the jnp path, including the fused
    until-tol residual norms."""
    cfg = MultigridConfig(finest_level=6, coarsest_level=4,
                          smoother="zebra_x", nu1=1, nu2=1,
                          use_pallas=False)
    prob = AnisotropicPoissonProblem(cfg, eps_x=1.0, eps_y=0.01,
                                     align=256, min_pad_level=0)
    hier = prob.hierarchy
    b = prob.rhs()
    ref = solve_fixed(hier, cfg, b, num_cycles=2)
    pcfg = MultigridConfig(finest_level=6, coarsest_level=4,
                           smoother="zebra_x", nu1=1, nu2=1,
                           use_pallas=True)
    from tpu_multigrid.cycles import _use_zebra_super_kernels
    assert _use_zebra_super_kernels(hier.levels[0], hier.levels[1], pcfg,
                                    jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = solve_fixed(hier, pcfg, b, num_cycles=2)
        jax.block_until_ready(got.u)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               rtol=1e-3, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.res_history),
                               np.asarray(ref.res_history), rtol=2e-4)

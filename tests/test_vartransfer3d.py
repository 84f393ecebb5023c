"""3D var-coefficient V-cycle super-kernels (K1v₃/K2v₃) vs jnp, interpret.

tests/test_vartransfer_kernels.py covers the 2D analogues and
tests/test_transfer3d.py the constant-coefficient 3D kernels.  Budgets are
shrunk to force multi-tile geometries; `sync` calls ``block_until_ready``
between eager interpret launches (CLAUDE.md interpret-race notes).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid.core import ops3d
from tpu_multigrid.core.operators import diffusion_op3_host
from tpu_multigrid.core.ops import chebyshev_omegas
from tpu_multigrid.kernels import vartransfer3d


N = 32
SHAPE = (48, 48, 128)
SHAPE_C = (32, 32, 128)          # padded beyond Sf/2 (exercises clamps)


def sync(x):
    jax.block_until_ready(x)
    return x


def _cells(rng, n):
    # strictly positive, O(1) variation
    return (1.0 + 0.8 * rng.random((n, n, n))).astype(np.float32)


@pytest.fixture
def op(rng):
    return diffusion_op3_host(_cells(rng, N), N, SHAPE[0], SHAPE[2])


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
    monkeypatch.setattr(vartransfer3d, "VAR_WINDOW_BYTES", request.param)
    fns = (vartransfer3d.var_smooth_restrict3,
           vartransfer3d.var_prolong_smooth3,
           vartransfer3d.var_prolong_smooth_resnorm3)
    for fn in fns:
        fn._clear_cache()
    yield request.param
    for fn in fns:
        fn._clear_cache()


def test_supported_gates():
    f32 = jnp.float32
    ok = vartransfer3d.supported_var3
    assert ok((272, 272, 384), (144, 144, 256), 3, f32)
    assert ok((272, 272, 384), (144, 144, 256), 3, f32, nplanes=4)
    assert not ok((272, 272, 384), (144, 144, 256), 3, jnp.float64)
    assert not ok((272, 272, 384), (144, 144, 256), 3, f32, nplanes=5)
    assert not ok((48, 48, 128), (32, 32, 128), 3, f32)      # Sx < 256
    assert not ok((264, 264, 384), (144, 144, 256), 3, f32)  # Sy % 16
    assert not ok((272, 272, 384), (120, 144, 256), 3, f32)  # 2*Szc < Sz


def _jnp_k1(op, u, b, sweeps, smoother, omega):
    un = op.smooth(u, b, smoother=smoother, omega=omega, sweeps=sweeps)
    rc = ops3d.restrict_fw3(op.residual(un, b), op.n, SHAPE_C)
    return un, rc


@pytest.mark.parametrize("smoother,omega", [
    ("jacobi", 2.0 / 3.0),
    ("jacobi", chebyshev_omegas(3, 0.1)),
    ("rbgs", 1.0),
])
def test_k1v3_smooth_restrict(op, grids, budget, smoother, omega):
    u, b, _ = grids
    coef = vartransfer3d._flat_coef3(op)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = sync(vartransfer3d.var_smooth_restrict3(
            u, b, coef, N, SHAPE_C, 3, smoother, omega))
    wu, wrc = _jnp_k1(op, u, b, 3, smoother, omega)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=2e-6)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc), atol=1e-5)


def test_k2v3_prolong_smooth(op, grids, budget):
    u, b, ec = grids
    coef = vartransfer3d._flat_coef3(op)
    with pltpu.force_tpu_interpret_mode():
        gu = sync(vartransfer3d.var_prolong_smooth3(
            u, b, ec, coef, N, 2, "jacobi", 2.0 / 3.0))
    w = ops3d.mask_interior3(u + ops3d.prolong3(ec, N // 2, SHAPE), N)
    wu = op.smooth(w, b, smoother="jacobi", omega=2.0 / 3.0, sweeps=2)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=2e-6)


def test_k2v3_resnorm(op, grids, budget):
    u, b, ec = grids
    coef = vartransfer3d._flat_coef3(op)
    with pltpu.force_tpu_interpret_mode():
        gu, gn = sync(vartransfer3d.var_prolong_smooth_resnorm3(
            u, b, ec, coef, N, 2, "jacobi", 2.0 / 3.0))
    w = ops3d.mask_interior3(u + ops3d.prolong3(ec, N // 2, SHAPE), N)
    wu = op.smooth(w, b, smoother="jacobi", omega=2.0 / 3.0, sweeps=2)
    wn = float(jnp.sqrt(jnp.sum(
        op.residual(wu, b).astype(jnp.float32) ** 2)))
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=2e-6)
    assert abs(float(gn) - wn) / max(wn, 1e-30) < 1e-4


def test_k1v3_with_reaction_plane(rng, grids):
    """4-plane stack: c2*h² joins the in-window diagonal."""
    from tpu_multigrid.problems.diffusion3d import _with_shift3
    base = diffusion_op3_host(_cells(rng, N), N, SHAPE[0], SHAPE[2])
    op = _with_shift3(base, 5.0, np.float32)
    u, b, _ = grids
    coef = vartransfer3d._flat_coef3(op)
    assert coef.shape[0] == 4
    with pltpu.force_tpu_interpret_mode():
        gu, grc = sync(vartransfer3d.var_smooth_restrict3(
            u, b, coef, N, SHAPE_C, 2, "jacobi", 2.0 / 3.0))
    wu, wrc = _jnp_k1(op, u, b, 2, "jacobi", 2.0 / 3.0)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=2e-6)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc), atol=1e-5)


def test_fused_var_cycle_matches_jnp(monkeypatch):
    """cycles.cycle with the K1v₃/K2v₃ branches forced on a small grid.

    The real gate needs Sx >= 256 (too slow for interpret CI), so the
    supported check is monkeypatched; the kernels themselves handle any
    qualifying quanta.
    """
    from tpu_multigrid import MultigridConfig
    from tpu_multigrid import cycles
    from tpu_multigrid.problems import Diffusion3DProblem

    # coarsest 3 (n=8, 343 unknowns): a coarsest of 4 means a 3375²
    # dense inverse whose host assembly dominates the test (~minutes on
    # this 1-core host).  Three levels also put TWO pairs on the fused
    # var branch.
    cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                          smoother="chebyshev", nu1=3, nu2=2,
                          dtype=jnp.float32, use_pallas=True)
    prob = Diffusion3DProblem(
        cfg, coefficient=lambda x, y, z: 1.0 + x + 2 * y + z,
        align=16, min_pad_level=0, lane_align=128)
    op, opc = prob.hierarchy.levels[0], prob.hierarchy.levels[1]
    # real gate: off at this size (Sx = 128)
    assert not cycles._use_var_super_kernels3(op, opc, cfg, jnp.float32)
    monkeypatch.setattr(vartransfer3d, "supported_var3",
                        lambda *a, **k: True)
    assert cycles._use_var_super_kernels3(op, opc, cfg, jnp.float32)
    b = prob.rhs()
    u0 = jnp.zeros_like(b)
    run_cycle = jax.jit(lambda h, u, bb: cycles.cycle(h, cfg, u, bb))
    run_norm = jax.jit(
        lambda h, u, bb: cycles.cycle_with_norm(h, cfg, u, bb))
    with pltpu.force_tpu_interpret_mode():
        up = sync(run_cycle(prob.hierarchy, u0, b))
        upn, nn = sync(run_norm(prob.hierarchy, u0, b))
    cfgj = dataclasses.replace(cfg, use_pallas=False)
    uj = cycles.cycle(prob.hierarchy, cfgj, u0, b)
    wn = float(jnp.sqrt(jnp.sum(
        op.residual(uj, b).astype(jnp.float32) ** 2)))
    np.testing.assert_allclose(np.asarray(up), np.asarray(uj), atol=2e-6)
    np.testing.assert_allclose(np.asarray(upn), np.asarray(uj), atol=2e-6)
    assert abs(float(nn) - wn) / wn < 1e-4

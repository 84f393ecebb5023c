"""Directional (variable-wind upwind) 3D super-kernels vs jnp, interpret.

K1v₃/K2v₃ with the 6-plane nonsymmetric stack (kernels/vartransfer3d::
_expand_dir3) against the ``Directional7Op`` jnp path — the 3D lift of
tests/test_nonsym_kernels.py (2D 9-plane tier).  VERDICT r4 next #1.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid.core import ops3d
from tpu_multigrid.core.ops import chebyshev_omegas
from tpu_multigrid.kernels import vartransfer3d
from tpu_multigrid.problems.convection3d import (Directional7Op,
                                                 convection_diffusion_op3)


N = 32
SHAPE = (48, 48, 128)
SHAPE_C = (32, 32, 128)


def sync(x):
    jax.block_until_ready(x)
    return x


def _wind(ax):
    # smooth recirculating winds, O(1), sign changes inside the domain
    if ax == 0:
        return lambda x, y, z: np.sin(2 * np.pi * x) * (0.5 + z)
    if ax == 1:
        return lambda x, y, z: np.cos(2 * np.pi * y) - 0.3
    return lambda x, y, z: x - y


@pytest.fixture
def op():
    return convection_diffusion_op3(N, SHAPE[0], SHAPE[2], 0.05,
                                    _wind(2), _wind(1), _wind(0))


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
    monkeypatch.setattr(vartransfer3d, "DIR_WINDOW_BYTES", request.param)
    fns = (vartransfer3d.var_smooth_restrict3,
           vartransfer3d.var_prolong_smooth3,
           vartransfer3d.var_prolong_smooth_resnorm3)
    for fn in fns:
        fn._clear_cache()
    yield request.param
    for fn in fns:
        fn._clear_cache()


def test_stack_layout_and_gates(op):
    assert op.STENCIL27 is None
    coef = vartransfer3d._flat_coef3(op)
    assert coef.shape == (6, *SHAPE)
    # cp/cm are views of the single-copy stack
    np.testing.assert_array_equal(np.asarray(op.cp[2]),
                                  np.asarray(coef[2]))
    np.testing.assert_array_equal(np.asarray(op.cm[0]),
                                  np.asarray(coef[3]))
    # derived diagonal == stored diagonal (pointwise six-plane sum)
    d = np.asarray(coef, np.float64).sum(0)
    np.testing.assert_allclose(d, np.asarray(op.diag, np.float64),
                               rtol=2e-6)
    ok = vartransfer3d.supported_var3
    assert ok((272, 272, 384), (144, 144, 256), 3, jnp.float32, nplanes=6)
    assert not ok((272, 272, 384), (144, 144, 256), 3, jnp.float32,
                  nplanes=7)


def test_roundtrip_device_put(op):
    """device_put / tree flatten keeps the single-stack layout."""
    leaves, treedef = jax.tree.flatten(op)
    assert len(leaves) == 3            # stack, diag, inv_diag
    op2 = jax.tree.unflatten(treedef, leaves)
    assert op2.coef_stack is not None
    np.testing.assert_array_equal(np.asarray(op2.cp[1]),
                                  np.asarray(op.cp[1]))


def _jnp_k1(op, u, b, sweeps, smoother, omega):
    un = op.smooth(u, b, smoother=smoother, omega=omega, sweeps=sweeps)
    rc = ops3d.restrict_fw3(op.residual(un, b), op.n, SHAPE_C)
    return un, rc


@pytest.mark.parametrize("smoother,omega", [
    ("jacobi", chebyshev_omegas(3, 0.1)),
    ("rbgs", 1.0),
])
def test_k1v3_dir(op, grids, budget, smoother, omega):
    u, b, _ = grids
    coef = vartransfer3d._flat_coef3(op)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = sync(vartransfer3d.var_smooth_restrict3(
            u, b, coef, N, SHAPE_C, 3, smoother, omega))
    wu, wrc = _jnp_k1(op, u, b, 3, smoother, omega)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=3e-6)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc), atol=2e-5)


def test_k2v3_dir_resnorm(op, grids, budget):
    u, b, ec = grids
    coef = vartransfer3d._flat_coef3(op)
    with pltpu.force_tpu_interpret_mode():
        gu, gn = sync(vartransfer3d.var_prolong_smooth_resnorm3(
            u, b, ec, coef, N, 2, "jacobi", 2.0 / 3.0))
    w = ops3d.mask_interior3(u + ops3d.prolong3(ec, N // 2, SHAPE), N)
    wu = op.smooth(w, b, smoother="jacobi", omega=2.0 / 3.0, sweeps=2)
    wn = float(jnp.sqrt(jnp.sum(
        op.residual(wu, b).astype(jnp.float32) ** 2)))
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=3e-6)
    assert abs(float(gn) - wn) / max(wn, 1e-30) < 1e-4


def test_fused_dir_cycle_matches_jnp(monkeypatch):
    """cycles.cycle with the directional K1v₃/K2v₃ branches forced.

    The real gate needs Sx >= 256 (too slow for interpret CI), so the
    supported check is monkeypatched (tests/test_vartransfer3d.py
    precedent)."""
    from tpu_multigrid import MultigridConfig, cycles
    from tpu_multigrid.problems.convection3d import (
        ConvectionDiffusion3DProblem)

    cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                          smoother="rbgs", nu1=2, nu2=1,
                          dtype=jnp.float32, use_pallas=True)
    prob = ConvectionDiffusion3DProblem(
        cfg, eps=0.05, bx=_wind(2), by=_wind(1), bz=_wind(0),
        align=16, min_pad_level=0, lane_align=128)
    op, opc = prob.hierarchy.levels[0], prob.hierarchy.levels[1]
    assert isinstance(op, Directional7Op) and op.STENCIL27 is None
    # real gate: off at this size (Sx = 128)
    assert not cycles._use_var_super_kernels3(op, opc, cfg, jnp.float32)
    monkeypatch.setattr(vartransfer3d, "supported_var3",
                        lambda *a, **k: True)
    assert cycles._use_var_super_kernels3(op, opc, cfg, jnp.float32)
    b = prob.rhs()
    u0 = jnp.zeros_like(b)
    run_norm = jax.jit(
        lambda h, u, bb: cycles.cycle_with_norm(h, cfg, u, bb))
    with pltpu.force_tpu_interpret_mode():
        upn, nn = sync(run_norm(prob.hierarchy, u0, b))
    cfgj = dataclasses.replace(cfg, use_pallas=False)
    uj = cycles.cycle(prob.hierarchy, cfgj, u0, b)
    wn = float(jnp.sqrt(jnp.sum(
        op.residual(uj, b).astype(jnp.float32) ** 2)))
    np.testing.assert_allclose(np.asarray(upn), np.asarray(uj), atol=3e-6)
    assert abs(float(nn) - wn) / wn < 1e-4

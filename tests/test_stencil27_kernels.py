"""Static 3x3x3-stencil variant of the K1₃/K2₃ super-kernels vs the jnp
constant-operator tiers (interpret mode on CPU).

Covers the two constant compact 19-point families: the 3D Mehrstellen
operator (core.operators.Const19Op) and the rotated constant-tensor
operator (problems.anisotropic3d.Rotated3DOp) — compile-time weights,
zero stored volumes, zero extra HBM traffic vs the 7-point kernels
(kernels/stencil3d._off_app27).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid import MultigridConfig
from tpu_multigrid.core import ops, ops3d
from tpu_multigrid.core.operators import Const19Op
from tpu_multigrid.cycles import _use_super_kernels3, cycle
from tpu_multigrid.kernels import transfer3d as T3
from tpu_multigrid.problems.anisotropic3d import (Rotated3DOp,
                                                  RotatedAnisotropic3DProblem,
                                                  rotation_tensor3)
from tpu_multigrid.problems.poisson4_3d import Poisson4_3DProblem

N, S, SX = 128, 144, 256
NC, SC, SCX = 64, 80, 128
PAD = dict(align=16, min_pad_level=0, lane_align=128)


def _grids(seed=0, scale=0.1):
    rng = np.random.default_rng(seed)
    u = np.zeros((S, S, SX), np.float32)
    b = np.zeros((S, S, SX), np.float32)
    u[1:N, 1:N, 1:N] = scale * rng.standard_normal((N - 1,) * 3)
    b[1:N, 1:N, 1:N] = rng.standard_normal((N - 1,) * 3)
    return jnp.asarray(u), jnp.asarray(b)


def _K():
    return rotation_tensor3(1.0, 0.05, 1.0, math.radians(30), "xy")


_OPS = {
    "const19": lambda: Const19Op(N, S, SX),
    "rotated": lambda: Rotated3DOp(N, S, _K(), SX),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", ["const19", "rotated"])
@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
def test_k1_stencil27_matches_jnp(name, smoother):
    op = _OPS[name]()
    u, b = _grids()
    with pltpu.force_tpu_interpret_mode():
        gu, grc = jax.block_until_ready(T3.smooth_restrict3(
            u, b, N, (SC, SC, SCX), 2, smoother, 2 / 3,
            stencil=op.STENCIL27))
    wu = op.smooth(u, b, smoother=smoother, omega=2 / 3, sweeps=2)
    wrc = ops3d.restrict_fw3(op.residual(wu, b), N, (SC, SC, SCX))
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["const19", "rotated"])
def test_k2_stencil27_matches_jnp_with_resnorm(name):
    op = _OPS[name]()
    u, b = _grids()
    rng = np.random.default_rng(3)
    ec = np.zeros((SC, SC, SCX), np.float32)
    ec[1:NC, 1:NC, 1:NC] = 0.05 * rng.standard_normal((NC - 1,) * 3)
    ec = jnp.asarray(ec)
    with pltpu.force_tpu_interpret_mode():
        g2, gn = jax.block_until_ready(T3.prolong_smooth_resnorm3(
            u, b, ec, N, 2, "jacobi", 2 / 3, stencil=op.STENCIL27))
    w2 = op.smooth(
        ops3d.mask_interior3(u + ops3d.prolong3(ec, NC, (S, S, SX)), N),
        b, smoother="jacobi", omega=2 / 3, sweeps=2)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(w2),
                               rtol=1e-5, atol=1e-6)
    want = float(ops.norm2(op.residual(g2, b)))
    assert abs(float(gn) - want) <= 1e-4 * max(want, 1.0)


def test_dispatch_gate_stencil27():
    cfg = MultigridConfig(finest_level=7, coarsest_level=3,
                          smoother="chebyshev", nu1=3, nu2=2,
                          use_pallas=True)
    p = Poisson4_3DProblem(cfg, **PAD)
    h = p.hierarchy
    assert _use_super_kernels3(h.levels[0], h.levels[1], cfg, jnp.float32)
    cfg_j = dataclasses.replace(cfg, use_pallas=False)
    assert not _use_super_kernels3(h.levels[0], h.levels[1], cfg_j,
                                   jnp.float32)
    # default cubic (unaligned) hierarchy -> geometry gate rejects
    p1 = Poisson4_3DProblem(cfg)
    assert not _use_super_kernels3(p1.hierarchy.levels[0],
                                   p1.hierarchy.levels[1], cfg,
                                   jnp.float32)
    r = RotatedAnisotropic3DProblem(cfg, eps_y=0.05,
                                    angle=math.radians(30), **PAD)
    assert _use_super_kernels3(r.hierarchy.levels[0],
                               r.hierarchy.levels[1], cfg, jnp.float32)


def test_convection3d_constant_wind_gate():
    """Constant winds -> each level's upwind stencil is spatially
    constant and rides the fused static-stencil kernels; variable winds
    keep the jnp Directional7Op path."""
    from tpu_multigrid.problems.convection3d import (
        ConvectionDiffusion3DProblem)

    cfg = MultigridConfig(finest_level=7, coarsest_level=3,
                          smoother="rbgs", nu1=2, nu2=2, use_pallas=True)
    p = ConvectionDiffusion3DProblem(cfg, eps=0.01, bx=1.0, by=0.5,
                                     bz=0.25, **PAD)
    assert _use_super_kernels3(p.hierarchy.levels[0],
                               p.hierarchy.levels[1], cfg, jnp.float32)
    pv = ConvectionDiffusion3DProblem(cfg, eps=0.01,
                                      bx=lambda x, y, z: 1.0 + x, **PAD)
    assert not _use_super_kernels3(pv.hierarchy.levels[0],
                                   pv.hierarchy.levels[1], cfg,
                                   jnp.float32)


@pytest.mark.slow
def test_convection3d_fused_cycle_matches_jnp_trajectory():
    from tpu_multigrid.problems.convection3d import (
        ConvectionDiffusion3DProblem)

    cfg_f = MultigridConfig(finest_level=7, coarsest_level=3,
                            smoother="rbgs", nu1=2, nu2=2,
                            use_pallas=True)
    cfg_j = dataclasses.replace(cfg_f, use_pallas=False)
    p = ConvectionDiffusion3DProblem(cfg_f, eps=0.01, bx=1.0, by=0.5,
                                     bz=0.25, **PAD)
    h = p.hierarchy
    b = p.rhs()
    u0 = jnp.zeros(h.levels[0].grid_shape, jnp.float32)
    uj = u0
    for _ in range(2):
        uj = cycle(h, cfg_j, uj, b)
    step = jax.jit(lambda v: cycle(h, cfg_f, v, b))
    up = u0
    with pltpu.force_tpu_interpret_mode():
        for _ in range(2):
            up = jax.block_until_ready(step(up))
    np.testing.assert_allclose(np.asarray(up), np.asarray(uj),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["mehr3", "rot3"])
def test_stencil27_fused_cycle_matches_jnp_trajectory(name):
    cfg_f = MultigridConfig(finest_level=7, coarsest_level=3,
                            smoother="chebyshev", nu1=3, nu2=2,
                            use_pallas=True)
    cfg_j = dataclasses.replace(cfg_f, use_pallas=False)
    if name == "mehr3":
        p = Poisson4_3DProblem(cfg_f, **PAD)
    else:
        p = RotatedAnisotropic3DProblem(cfg_f, eps_y=0.05,
                                        angle=math.radians(30), **PAD)
    h = p.hierarchy
    b = p.rhs()
    u0 = jnp.zeros(h.levels[0].grid_shape, jnp.float32)
    uj = u0
    for _ in range(2):
        uj = cycle(h, cfg_j, uj, b)
    step = jax.jit(lambda v: cycle(h, cfg_f, v, b))
    up = u0
    with pltpu.force_tpu_interpret_mode():
        for _ in range(2):
            up = jax.block_until_ready(step(up))
    np.testing.assert_allclose(np.asarray(up), np.asarray(uj),
                               rtol=1e-4, atol=1e-5)

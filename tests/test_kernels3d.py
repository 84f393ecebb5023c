"""3D Pallas streaming-smoother kernels vs the jnp reference ops, in
interpret mode on CPU (tests/test_kernels.py is the 2D analogue).

Shrunken VMEM budgets force the multi-tile paths (full-y z-slabs and true
two-axis (z, y) tiling) so the ghost-zone shrink logic and the fused-row
seam-masking argument (kernels/stencil3d.py docstring) are both exercised.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid.core import ops3d
from tpu_multigrid.kernels import stencil3d


N = 30
SHAPE = (32, 40, 128)


@pytest.fixture
def grids(rng):
    u = np.zeros(SHAPE, np.float32)
    u[1:N, 1:N, 1:N] = rng.standard_normal((N - 1,) * 3)
    b = np.zeros(SHAPE, np.float32)
    b[1:N, 1:N, 1:N] = rng.standard_normal((N - 1,) * 3)
    return jnp.asarray(u), jnp.asarray(b)


@pytest.fixture(params=[256 * 1024, 64 * 2 ** 20],
                ids=["tiled", "single-tile"])
def budget(request, monkeypatch):
    monkeypatch.setattr(stencil3d, "WINDOW_BYTES", request.param)
    # separate trace caches per budget
    for fn in (stencil3d.jacobi_sweeps3, stencil3d.jacobi_sweeps_residual3,
               stencil3d.rbgs_sweeps3, stencil3d.rbgs_sweeps_residual3,
               stencil3d.residual3):
        fn._clear_cache()
    yield request.param
    for fn in (stencil3d.jacobi_sweeps3, stencil3d.jacobi_sweeps_residual3,
               stencil3d.rbgs_sweeps3, stencil3d.rbgs_sweeps_residual3,
               stencil3d.residual3):
        fn._clear_cache()


def test_supported_gates():
    f32 = jnp.float32
    assert stencil3d.supported3((264, 264, 384), f32, 6)
    assert stencil3d.supported3((520, 520, 640), f32, 6)
    assert not stencil3d.supported3((264, 264, 384), jnp.float64, 2)
    assert not stencil3d.supported3((257, 257, 384), f32, 2)  # Sy % 8
    assert not stencil3d.supported3((264, 264, 264), f32, 2)  # Sx % 128
    assert not stencil3d.supported3((40, 40, 64), f32, 2)     # Sx too small


def test_jacobi_matches_jnp(grids, budget):
    u, b = grids
    with pltpu.force_tpu_interpret_mode():
        got = stencil3d.jacobi_sweeps3(u, b, N, 2.0 / 3.0, 3)
    want = ops3d.jacobi_sweeps3(u, b, N, 2.0 / 3.0, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6)


def test_jacobi_chebyshev_schedule(grids, budget):
    u, b = grids
    from tpu_multigrid.core.ops import chebyshev_omegas
    om = chebyshev_omegas(3)
    with pltpu.force_tpu_interpret_mode():
        got = stencil3d.jacobi_sweeps3(u, b, N, om, 3)
    want = ops3d.jacobi_sweeps3(u, b, N, om, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6)


def test_jacobi_residual_fused(grids, budget):
    u, b = grids
    with pltpu.force_tpu_interpret_mode():
        gu, gr = stencil3d.jacobi_sweeps_residual3(u, b, N, 2.0 / 3.0, 2)
    wu = ops3d.jacobi_sweeps3(u, b, N, 2.0 / 3.0, 2)
    wr = ops3d.residual3(wu, b, N)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=2e-6)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr), atol=1e-5)


def test_rbgs_matches_jnp(grids, budget):
    u, b = grids
    with pltpu.force_tpu_interpret_mode():
        got = stencil3d.rbgs_sweeps3(u, b, N, 2)
    want = ops3d.redblack_gs_sweeps3(u, b, N, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6)


def test_residual_only(grids, budget):
    u, b = grids
    with pltpu.force_tpu_interpret_mode():
        got = stencil3d.residual3(u, b, N)
    want = ops3d.residual3(u, b, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_cycle_pallas_matches_jnp_interpret():
    """Full V-cycle with the 3D kernel branches wired in (cycles.cycle)."""
    import dataclasses
    from tpu_multigrid import MultigridConfig
    from tpu_multigrid.problems import Poisson3DProblem
    from tpu_multigrid.cycles import cycle

    cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                          smoother="chebyshev", nu1=3, nu2=2,
                          dtype=jnp.float32, use_pallas=True)
    prob = Poisson3DProblem(cfg, align=8, min_pad_level=0, lane_align=128)
    b = prob.rhs()
    u0 = jnp.zeros_like(b)
    # the kernels must actually be in the traced program
    jaxpr = str(jax.make_jaxpr(
        lambda h, u, bb: cycle(h, cfg, u, bb))(prob.hierarchy, u0, b))
    assert "pallas_call" in jaxpr
    run_cycle = jax.jit(lambda h, u, bb: cycle(h, cfg, u, bb))
    with pltpu.force_tpu_interpret_mode():
        up = run_cycle(prob.hierarchy, u0, b)
        jax.block_until_ready(up)
    uj = cycle(prob.hierarchy, dataclasses.replace(cfg, use_pallas=False),
               u0, b)
    np.testing.assert_allclose(np.asarray(up), np.asarray(uj), atol=2e-6)

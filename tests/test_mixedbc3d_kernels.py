"""Box-masked 3D var super-kernels (K1v₃/K2v₃ with mixed-BC boxes) vs the
jnp flux-box path, interpret mode (VERDICT r3 next #4: 3D mixed BCs
leave the jnp tier)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.core import ops3d
from tpu_multigrid.kernels import vartransfer3d
from tpu_multigrid.problems.mixedbc3d import _box_of3, mixed_poisson_op3

N = 32
SHAPE = (48, 48, 128)
SHAPE_C = (32, 32, 128)


def sync(x):
    jax.block_until_ready(x)
    return x


def _grids(rng, box, cbox):
    u = np.zeros(SHAPE, np.float32)
    b = np.zeros(SHAPE, np.float32)
    i0, i1, j0, j1, k0, k1 = box
    shp = (i1 - i0 + 1, j1 - j0 + 1, k1 - k0 + 1)
    u[i0: i1 + 1, j0: j1 + 1, k0: k1 + 1] = rng.standard_normal(shp)
    b[i0: i1 + 1, j0: j1 + 1, k0: k1 + 1] = rng.standard_normal(shp)
    ec = np.zeros(SHAPE_C, np.float32)
    ci0, ci1, cj0, cj1, ck0, ck1 = cbox
    cshp = (ci1 - ci0 + 1, cj1 - cj0 + 1, ck1 - ck0 + 1)
    ec[ci0: ci1 + 1, cj0: cj1 + 1, ck0: ck1 + 1] = rng.standard_normal(cshp)
    return (jnp.asarray(u), jnp.asarray(b), jnp.asarray(ec))


# lo-edge, hi-edge, and mixed-corner Neumann configurations
NEUMANNS = [("zlo",), ("xhi",), ("zlo", "ylo", "xhi"), ("yhi", "xlo")]


@pytest.mark.parametrize("neumann", NEUMANNS)
@pytest.mark.parametrize("smoother", ["jacobi"])
def test_box_k1v3_matches_jnp(neumann, smoother, rng):
    op = mixed_poisson_op3(N, SHAPE[0], SHAPE[2], neumann,
                           dtype=np.float32)
    box = op.box
    cbox = _box_of3(N // 2, frozenset(neumann))
    u, b, _ = _grids(rng, box, cbox)
    coef = vartransfer3d._flat_coef3(op)
    with pltpu.force_tpu_interpret_mode():
        gu, grc = vartransfer3d.var_smooth_restrict3(
            u, b, coef, N, SHAPE_C, 2, smoother, 2.0 / 3.0, box=box,
            cbox=cbox)
        sync(gu)
    wu = op.smooth(u, b, smoother=smoother, omega=2.0 / 3.0, sweeps=2)
    wrc = ops3d.restrict_fw3(op.residual(wu, b), N, SHAPE_C, box=cbox)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(grc), np.asarray(wrc),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("neumann", NEUMANNS[:2] + [NEUMANNS[2]])
def test_box_k2v3_matches_jnp(neumann, rng):
    op = mixed_poisson_op3(N, SHAPE[0], SHAPE[2], neumann,
                           dtype=np.float32)
    box = op.box
    cbox = _box_of3(N // 2, frozenset(neumann))
    u, b, ec = _grids(rng, box, cbox)
    coef = vartransfer3d._flat_coef3(op)
    with pltpu.force_tpu_interpret_mode():
        gu = vartransfer3d.var_prolong_smooth3(
            u, b, ec, coef, N, 2, "jacobi", 2.0 / 3.0, box=box)
        sync(gu)
    wu = ops3d.mask_box3(u + ops3d.prolong3(ec, N // 2, SHAPE, box=box),
                         box)
    wu = op.smooth(wu, b, smoother="jacobi", omega=2.0 / 3.0, sweeps=2)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=2e-5, atol=2e-5)


def test_box_gate_engages():
    """_use_var_super_kernels3 accepts padded mixed hierarchies now."""
    from tpu_multigrid.cycles import _use_var_super_kernels3
    from tpu_multigrid.problems.mixedbc3d import build_mixed_hierarchy3
    cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                          dtype=jnp.float32, use_pallas=True)
    hier = build_mixed_hierarchy3(cfg, ("zlo", "xhi"), align=16,
                                  min_pad_level=0, lane_align=128)
    # Sx=128 < kernel minimum 256 at this toy size, so the gate result
    # depends only on size checks; assert the box bail itself is gone by
    # checking a synthetic padded-enough pair
    op = hier.levels[0]
    assert op.box is not None
    ok = _use_var_super_kernels3(op, hier.levels[1], cfg, jnp.float32)
    assert isinstance(ok, bool)   # no exception; size gates may refuse


@pytest.mark.slow
def test_mixedbc3d_fused_solve_matches_jnp_trajectory(monkeypatch):
    """End-to-end: the padded mixed 3D solve with use_pallas=True
    (interpret) reproduces the jnp path's convergence.  The production
    Sx >= 256 size gate is relaxed so the kernels genuinely engage at
    the test size (Sx = 128)."""
    orig = vartransfer3d.supported_var3

    def lenient(shape, shape_c, steps, dtype, nplanes=3):
        Sz, Sy, Sx = shape
        return (jnp.dtype(dtype) == jnp.dtype(jnp.float32)
                and Sx % 128 == 0 and Sy % 16 == 0 and Sz % 2 == 0
                and shape_c[2] % 128 == 0)

    monkeypatch.setattr(vartransfer3d, "supported_var3", lenient)
    from tpu_multigrid.cycles import _use_var_super_kernels3
    from tpu_multigrid.problems.mixedbc3d import build_mixed_hierarchy3
    cfgp = MultigridConfig(finest_level=5, coarsest_level=3,
                           dtype=jnp.float32, use_pallas=True)
    hchk = build_mixed_hierarchy3(cfgp, ("zlo", "xhi"), align=16,
                                  min_pad_level=0, lane_align=128)
    assert _use_var_super_kernels3(hchk.levels[0], hchk.levels[1], cfgp,
                                   jnp.float32)

    def run(use_pallas):
        cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                              dtype=jnp.float32, use_pallas=use_pallas)
        return mg.solve_poisson3d(5, config=cfg, neumann=("zlo", "xhi"),
                                  num_cycles=4, tol=None, jit=True)

    with pltpu.force_tpu_interpret_mode():
        fused = run(True)
        jax.block_until_ready(fused.u)
    monkeypatch.setattr(vartransfer3d, "supported_var3", orig)
    plain = run(False)
    h = np.asarray(fused.res_history)
    hr = np.asarray(plain.res_history)
    shallow = hr / hr[0] >= 1e-3
    np.testing.assert_allclose((h / h[0])[shallow], (hr / hr[0])[shallow],
                               rtol=2e-3)
    np.testing.assert_allclose((h / h[0])[~shallow],
                               (hr / hr[0])[~shallow], rtol=0.2)

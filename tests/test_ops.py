"""Operator unit tests (SURVEY.md §4 tier 1).

These are exactly the tests whose absence let the reference ship four
numerical bugs (zeroed restriction, int-truncated assembly, doubled
interpolation terms, omega=0 — SURVEY.md §5): smoother fixed points,
transfer adjointness, constant/bilinear transfer, and independent numpy
replicas of every operator.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid.core import ops
from tpu_multigrid.core.operators import diffusion_op, poisson_op
from tpu_multigrid import oracle


def random_interior(n, S, rng, batch=()):
    u = np.zeros(batch + (S, S))
    u[..., 1:n, 1:n] = rng.standard_normal(batch + (n - 1, n - 1))
    return jnp.asarray(u)


# ---------------------------------------------------------------------------
# 5-point apply / residual
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,S", [(16, 17), (16, 24), (8, 9)])
def test_apply_matches_oracle_matrix(n, S, rng):
    """Matrix-free apply == assembled CSR stiffness (reference semantics)."""
    u = random_interior(n, S, rng)
    got = np.asarray(ops.apply_poisson(u, n))
    a = oracle.poisson_matrix(n)
    want_int = (a @ np.asarray(u)[1:n, 1:n].reshape(-1)).reshape(n - 1, n - 1)
    want = np.zeros((S, S))
    want[1:n, 1:n] = want_int
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13)


def test_residual_definition(rng):
    n, S = 16, 17
    u = random_interior(n, S, rng)
    b = random_interior(n, S, rng)
    r = np.asarray(ops.residual(u, b, n))
    want = np.asarray(b) - np.asarray(ops.apply_poisson(u, n))
    want[0, :] = want[-1, :] = want[:, 0] = want[:, -1] = 0
    np.testing.assert_allclose(r, want, rtol=1e-13, atol=1e-14)


def test_apply_zero_outside_interior(rng):
    n, S = 8, 16
    u = random_interior(n, S, rng)
    out = np.asarray(ops.apply_poisson(u, n))
    mask = np.zeros((S, S), bool)
    mask[1:n, 1:n] = True
    assert np.all(out[~mask] == 0)


# ---------------------------------------------------------------------------
# Smoothers
# ---------------------------------------------------------------------------

def test_jacobi_fixed_point(rng):
    """If A v = b, a Jacobi sweep leaves v unchanged."""
    n, S = 16, 17
    v = random_interior(n, S, rng)
    b = ops.apply_poisson(v, n)
    v2 = ops.jacobi_sweeps(v, b, n, omega=2.0 / 3.0, sweeps=3)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v),
                               rtol=1e-12, atol=1e-12)


def test_rbgs_fixed_point(rng):
    n, S = 16, 17
    v = random_interior(n, S, rng)
    b = ops.apply_poisson(v, n)
    v2 = ops.redblack_gs_sweeps(v, b, n, sweeps=3)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v),
                               rtol=1e-12, atol=1e-12)


def _numpy_jacobi(u, b, n, omega, sweeps):
    u = np.array(u, dtype=np.float64)
    b = np.asarray(b)
    for _ in range(sweeps):
        un = u.copy()
        for i in range(1, n):
            for j in range(1, n):
                nbr = u[i - 1, j] + u[i + 1, j] + u[i, j - 1] + u[i, j + 1]
                un[i, j] = (1 - omega) * u[i, j] + omega * 0.25 * (b[i, j] + nbr)
        u = un
    return u


def test_jacobi_matches_numpy(rng):
    n, S = 8, 9
    u = random_interior(n, S, rng)
    b = random_interior(n, S, rng)
    got = np.asarray(ops.jacobi_sweeps(u, b, n, 2.0 / 3.0, 2))
    want = _numpy_jacobi(np.asarray(u), np.asarray(b), n, 2.0 / 3.0, 2)
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-14)


def _numpy_rbgs(u, b, n, sweeps):
    u = np.array(u, dtype=np.float64)
    b = np.asarray(b)
    for _ in range(sweeps):
        for parity in (0, 1):
            un = u.copy()
            for i in range(1, n):
                for j in range(1, n):
                    if (i + j) % 2 != parity:
                        continue
                    nbr = u[i - 1, j] + u[i + 1, j] + u[i, j - 1] + u[i, j + 1]
                    un[i, j] = 0.25 * (b[i, j] + nbr)
            u = un
    return u


def test_rbgs_matches_numpy(rng):
    n, S = 8, 9
    u = random_interior(n, S, rng)
    b = random_interior(n, S, rng)
    got = np.asarray(ops.redblack_gs_sweeps(u, b, n, 2))
    want = _numpy_rbgs(np.asarray(u), np.asarray(b), n, 2)
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-14)


def test_jacobi_smooths_high_frequency(rng):
    """omega=2/3 Jacobi damps the highest-frequency mode by ~|1-4w/2|... —
    concretely, oscillatory error shrinks much faster than smooth error."""
    n, S = 32, 33
    x = np.arange(S) / n
    xx, yy = np.meshgrid(x, x, indexing="ij")
    smooth_err = np.sin(np.pi * xx) * np.sin(np.pi * yy)
    osc_err = np.sin(np.pi * (n - 1) * xx) * np.sin(np.pi * (n - 1) * yy)
    b = jnp.zeros((S, S))
    for err, bound in ((osc_err, 0.2), (smooth_err, 1.1)):
        e0 = ops.mask_interior(jnp.asarray(err), n)
        e3 = ops.jacobi_sweeps(e0, b, n, 2.0 / 3.0, 3)
        ratio = float(ops.norm2(e3) / ops.norm2(e0))
        assert ratio < bound
    # and the smooth mode is barely damped (that's the coarse grid's job)
    e0 = ops.mask_interior(jnp.asarray(smooth_err), n)
    e1 = ops.jacobi_sweeps(e0, b, n, 2.0 / 3.0, 1)
    assert float(ops.norm2(e1) / ops.norm2(e0)) > 0.9


# ---------------------------------------------------------------------------
# Transfers
# ---------------------------------------------------------------------------

def test_restrict_is_adjoint_of_prolong(rng):
    """<R r, e>_coarse == <r, P e>_fine exactly (R = P^T, FEM scaling).

    SURVEY.md §4 item 1. In the reference this property was silently
    destroyed by the (1/16) integer-division bug (Poissons_SYCL.cpp:539).
    """
    nf, Sf = 16, 17
    nc, Sc = 8, 9
    r = random_interior(nf, Sf, rng)
    e = random_interior(nc, Sc, rng)
    lhs = float(jnp.vdot(ops.restrict_fw(r, nf, Sc), e))
    rhs = float(jnp.vdot(r, ops.prolong(e, nc, Sf)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-13)


def test_restrict_adjoint_padded(rng):
    nf, Sf = 16, 24
    nc, Sc = 8, 12
    r = random_interior(nf, Sf, rng)
    e = random_interior(nc, Sc, rng)
    lhs = float(jnp.vdot(ops.restrict_fw(r, nf, Sc), e))
    rhs = float(jnp.vdot(r, ops.prolong(e, nc, Sf)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-13)


def test_restrict_constant_deep_interior():
    """Full weighting of an interior-constant grid = 4c away from boundary
    (FEM scaling: stencil [[1,2,1],[2,4,2],[1,2,1]]/4 sums to 4)."""
    nf, Sf, nc, Sc = 32, 33, 16, 17
    r = ops.mask_interior(jnp.ones((Sf, Sf)), nf)
    c = np.asarray(ops.restrict_fw(r, nf, Sc))
    np.testing.assert_allclose(c[2 : nc - 1, 2 : nc - 1], 4.0, rtol=1e-13)


def _numpy_prolong(c, nc, Sf):
    f = np.zeros((Sf, Sf))
    for i in range(nc + 1):
        for j in range(nc + 1):
            f[2 * i, 2 * j] = c[i, j]
    for i in range(nc):
        for j in range(nc + 1):
            f[2 * i + 1, 2 * j] = 0.5 * (c[i, j] + c[i + 1, j])
    for i in range(nc + 1):
        for j in range(nc):
            f[2 * i, 2 * j + 1] = 0.5 * (c[i, j] + c[i, j + 1])
    for i in range(nc):
        for j in range(nc):
            f[2 * i + 1, 2 * j + 1] = 0.25 * (
                c[i, j] + c[i + 1, j] + c[i, j + 1] + c[i + 1, j + 1])
    return f


def test_prolong_matches_numpy(rng):
    nc, Sc, nf, Sf = 8, 9, 16, 17
    e = random_interior(nc, Sc, rng)
    got = np.asarray(ops.prolong(e, nc, Sf))
    want = _numpy_prolong(np.asarray(e)[: nc + 1, : nc + 1], nc, Sf)
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-14)


def _numpy_restrict(r, nf, Sc):
    nc = nf // 2
    c = np.zeros((Sc, Sc))
    for i in range(1, nc):
        for j in range(1, nc):
            fi, fj = 2 * i, 2 * j
            c[i, j] = (
                4 * r[fi, fj]
                + 2 * (r[fi - 1, fj] + r[fi + 1, fj] + r[fi, fj - 1] + r[fi, fj + 1])
                + r[fi - 1, fj - 1] + r[fi - 1, fj + 1]
                + r[fi + 1, fj - 1] + r[fi + 1, fj + 1]
            ) / 4.0
    return c


def test_restrict_matches_numpy(rng):
    nf, Sf, nc, Sc = 16, 17, 8, 9
    r = random_interior(nf, Sf, rng)
    got = np.asarray(ops.restrict_fw(r, nf, Sc))
    want = _numpy_restrict(np.asarray(r), nf, Sc)
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-14)


def test_padding_invariance(rng):
    """Every op gives identical physical-region results on padded arrays."""
    n = 16
    u_t = random_interior(n, n + 1, rng)
    b_t = random_interior(n, n + 1, rng)
    u_p = jnp.zeros((24, 24)).at[: n + 1, : n + 1].set(u_t)
    b_p = jnp.zeros((24, 24)).at[: n + 1, : n + 1].set(b_t)

    for tight, padded in [
        (ops.apply_poisson(u_t, n), ops.apply_poisson(u_p, n)),
        (ops.residual(u_t, b_t, n), ops.residual(u_p, b_p, n)),
        (ops.jacobi_sweeps(u_t, b_t, n, 2 / 3, 3),
         ops.jacobi_sweeps(u_p, b_p, n, 2 / 3, 3)),
        (ops.redblack_gs_sweeps(u_t, b_t, n, 2),
         ops.redblack_gs_sweeps(u_p, b_p, n, 2)),
    ]:
        tp = np.asarray(padded)
        np.testing.assert_allclose(tp[: n + 1, : n + 1], np.asarray(tight),
                                   rtol=1e-13, atol=1e-14)
        assert np.all(tp[n + 1 :, :] == 0) and np.all(tp[:, n + 1 :] == 0)


# ---------------------------------------------------------------------------
# Variable-coefficient operator
# ---------------------------------------------------------------------------

def test_diffusion_op_reduces_to_poisson(rng):
    n, S = 16, 17
    op = diffusion_op(jnp.ones((n, n)), n, S)
    u = random_interior(n, S, rng)
    np.testing.assert_allclose(np.asarray(op.apply(u)),
                               np.asarray(ops.apply_poisson(u, n)),
                               rtol=1e-13, atol=1e-13)


def test_diffusion_op_matches_oracle(rng):
    n, S = 16, 17
    cells = jnp.asarray(1.0 + rng.random((n, n)))
    op = diffusion_op(cells, n, S)
    u = random_interior(n, S, rng)
    a = oracle.diffusion_matrix(n, np.asarray(cells))
    want = (a @ np.asarray(u)[1:n, 1:n].reshape(-1)).reshape(n - 1, n - 1)
    got = np.asarray(op.apply(u))[1:n, 1:n]
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_diffusion_smoother_fixed_point(rng):
    n, S = 16, 17
    cells = jnp.asarray(1.0 + rng.random((n, n)))
    op = diffusion_op(cells, n, S)
    v = random_interior(n, S, rng)
    b = op.apply(v)
    for smoother in ("jacobi", "rbgs"):
        v2 = op.smooth(v, b, smoother=smoother, omega=2 / 3, sweeps=3)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v),
                                   rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# Reference-v2 transfer variants (injection restriction, P1 prolongation)
# ---------------------------------------------------------------------------

def test_restrict_injection_matches_numpy(rng):
    nf, Sf, nc, Sc = 16, 17, 8, 9
    r = random_interior(nf, Sf, rng)
    got = np.asarray(ops.restrict_injection(r, nf, Sc))
    want = np.zeros((Sc, Sc))
    rn = np.asarray(r)
    for i in range(1, nc):
        for j in range(1, nc):
            want[i, j] = 4.0 * rn[2 * i, 2 * j]
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-14)


def test_prolong_p1_matches_numpy(rng):
    nc, Sc, nf, Sf = 8, 9, 16, 17
    e = random_interior(nc, Sc, rng)
    got = np.asarray(ops.prolong_p1(e, nc, Sf))
    en = np.asarray(e)
    want = np.zeros((Sf, Sf))
    for i in range(nc + 1):
        for j in range(nc + 1):
            want[2 * i, 2 * j] = en[i, j]
    for i in range(nc):
        for j in range(nc + 1):
            want[2 * i + 1, 2 * j] = 0.5 * (en[i, j] + en[i + 1, j])
    for i in range(nc + 1):
        for j in range(nc):
            want[2 * i, 2 * j + 1] = 0.5 * (en[i, j] + en[i, j + 1])
    for i in range(nc):
        for j in range(nc):
            # diagonal edge midpoint: endpoints (i+1, j) and (i, j+1)
            want[2 * i + 1, 2 * j + 1] = 0.5 * (en[i + 1, j] + en[i, j + 1])
    want[0, :] = want[-1, :] = want[:, 0] = want[:, -1] = 0
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-14)


def test_v2_transfer_cycle_converges():
    """The reference-v2 operator pair (injection + P1) still yields a
    convergent (if slower) multigrid cycle."""
    import jax
    from tpu_multigrid import MultigridConfig, PoissonProblem, solve_fixed

    cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                          restriction="injection", prolongation="p1",
                          nu1=3, nu2=3, dtype=jnp.float64)
    prob = PoissonProblem(cfg)
    b = prob.rhs()
    res = jax.jit(lambda b: solve_fixed(prob.hierarchy, cfg, b, 10))(b)
    h = np.asarray(res.res_history)
    assert h[10] < 1e-3 * h[0], h

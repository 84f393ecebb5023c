"""General-DOF (topology-metadata) multigrid: tpu_multigrid.topo.

Covers the reference's WIP v2 machinery (``Multigrid_functions.cpp:16-26,
98-130,175-191``): metadata-driven transfers, ELL operators, per-level
assembled RHS FMG — including the DOF-numbering generality
(``topo_to_space_dict``) the structured fast path hard-codes away.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_multigrid import topo
from tpu_multigrid.core import ops
from tpu_multigrid.core.fem import assemble_from_elements


def grid_to_space(g, n):
    """(S,S) padded grid -> row-major interior space vector (m,)."""
    return np.asarray(g)[1:n, 1:n].reshape(-1)


def space_to_grid(v, n, S):
    g = np.zeros((S, S), np.asarray(v).dtype)
    g[1:n, 1:n] = np.asarray(v).reshape(n - 1, n - 1)
    return g


class TestTransfers:
    def test_prolong_matches_structured_p1(self, rng):
        nf, nc = 16, 8
        t = topo.structured_transfer(nf)
        ec_grid = np.zeros((nc + 1, nc + 1))
        ec_grid[1:nc, 1:nc] = rng.standard_normal((nc - 1, nc - 1))
        want = ops.prolong_p1(jnp.asarray(ec_grid), nc, nf + 1)
        got = t.prolong(jnp.asarray(grid_to_space(ec_grid, nc)))
        np.testing.assert_allclose(np.asarray(got),
                                   grid_to_space(want, nf), atol=1e-14)

    def test_restrict_matches_structured_injection(self, rng):
        nf, nc = 16, 8
        t = topo.structured_transfer(nf)  # default scale 4.0
        rf_grid = np.zeros((nf + 1, nf + 1))
        rf_grid[1:nf, 1:nf] = rng.standard_normal((nf - 1, nf - 1))
        want = ops.restrict_injection(jnp.asarray(rf_grid), nf, nc + 1)
        got = t.restrict(jnp.asarray(grid_to_space(rf_grid, nf)))
        np.testing.assert_allclose(np.asarray(got),
                                   grid_to_space(want, nc), atol=1e-14)

    def test_reference_unscaled_injection(self, rng):
        nf = 8
        t = topo.structured_transfer(nf, restrict_scale=1.0)
        rf = rng.standard_normal((nf - 1) ** 2)
        got = np.asarray(t.restrict(jnp.asarray(rf)))
        # coarse (ic, jc) takes the fine value at (2ic, 2jc), unweighted
        # (restriction2D, Multigrid_functions.cpp:122-130).
        nc = nf // 2
        for ic in range(1, nc):
            for jc in range(1, nc):
                fi = (2 * ic - 1) * (nf - 1) + (2 * jc - 1)
                assert got[(ic - 1) * (nc - 1) + (jc - 1)] == rf[fi]

    def test_vertex_dofs_inject(self):
        nf = 8
        t = topo.structured_transfer(nf)
        src0, src1 = np.asarray(t.src0), np.asarray(t.src1)
        for i in range(1, nf):
            for j in range(1, nf):
                fs = (i - 1) * (nf - 1) + (j - 1)
                if i % 2 == 0 and j % 2 == 0:
                    assert src0[fs] == src1[fs] != t.m_coarse
                else:
                    assert (src0[fs], src1[fs]) != (src1[fs], src0[fs]) or \
                        src0[fs] != src1[fs] or src0[fs] == t.m_coarse


class TestEll:
    def test_apply_matches_dense(self, rng):
        n = 8
        A, _ = assemble_from_elements(n)
        op = topo.ell_from_dense(A)
        x = rng.standard_normal(A.shape[0])
        np.testing.assert_allclose(np.asarray(op.apply(jnp.asarray(x))),
                                   A @ x, rtol=1e-12)

    def test_coo_merge_float_correct(self):
        # Duplicate entries with fractional values: the reference's
        # coo_to_csr truncates these to int (Poissons_SYCL.cpp:93).
        rows = np.array([0, 0, 1, 0])
        cols = np.array([0, 1, 1, 0])
        vals = np.array([0.25, -0.5, 2.0, 0.5])
        op = topo.ell_from_coo(rows, cols, vals, 2)
        x = jnp.asarray(np.array([1.0, 1.0]))
        np.testing.assert_allclose(np.asarray(op.apply(x)),
                                   [0.75 - 0.5, 2.0], rtol=1e-14)

    def test_jacobi_fixed_point(self, rng):
        n = 8
        A, _ = assemble_from_elements(n)
        op = topo.ell_from_dense(A)
        u = rng.standard_normal(A.shape[0])
        b = A @ u
        out = op.jacobi(jnp.asarray(u), jnp.asarray(b), 2.0 / 3.0, 5)
        np.testing.assert_allclose(np.asarray(out), u, rtol=1e-10)


class TestSolve:
    def test_vcycle_converges(self):
        hier = topo.build_structured_topo_hierarchy(4, 2, dtype=jnp.float64)
        b = hier.b_levels[0]
        u, hist = topo.solve_topo(hier, b, num_cycles=20)
        hist = np.asarray(hist)
        assert hist[-1] / hist[0] < 1e-10
        # geometric convergence: average factor well below 1
        rho = (hist[10] / hist[0]) ** 0.1
        assert rho < 0.35, rho
        # matches the dense direct solve
        A, bb = assemble_from_elements(16)
        np.testing.assert_allclose(np.asarray(u), np.linalg.solve(A, bb),
                                   rtol=1e-8)

    def test_unscaled_reference_injection_still_converges(self):
        hier = topo.build_structured_topo_hierarchy(
            4, 2, restrict_scale=1.0, dtype=jnp.float64)
        b = hier.b_levels[0]
        _, hist = topo.solve_topo(hier, b, num_cycles=40,
                                  nu1=10, nu2=10)
        hist = np.asarray(hist)
        # the reference's unscaled injection under-weights corrections 4x:
        # slower, but still converges with its heavy (10,10) smoothing
        assert hist[-1] / hist[0] < 1e-6

    def test_permutation_invariance(self, rng):
        """Arbitrary DOF numbering (topo_to_space generality): solving the
        permuted system gives the permuted solution, near-exactly."""
        levels = [4, 3, 2]
        perms = [rng.permutation((2 ** l - 1) ** 2) for l in levels]
        h0 = topo.build_structured_topo_hierarchy(4, 2, dtype=jnp.float64)
        hp = topo.build_structured_topo_hierarchy(4, 2, perms=perms,
                                                  dtype=jnp.float64)
        u0, hist0 = topo.solve_topo(h0, h0.b_levels[0], num_cycles=8)
        up, histp = topo.solve_topo(hp, hp.b_levels[0], num_cycles=8)
        np.testing.assert_allclose(np.asarray(up)[perms[0]],
                                   np.asarray(u0), rtol=1e-12)
        # history is f32 and summation order differs with the permuted
        # ELL row layout — identical trajectories up to f32 noise
        np.testing.assert_allclose(np.asarray(histp), np.asarray(hist0),
                                   rtol=1e-5)

    def test_fmg_assembled_rhs(self):
        """v2 FMG semantics: per-level assembled b_dict
        (Multigrid_functions.cpp:175-191)."""
        hier = topo.build_structured_topo_hierarchy(4, 2, dtype=jnp.float64)
        u = topo.fmg_topo(hier, nu0=3)
        A, b = assemble_from_elements(16)
        r = np.linalg.norm(b - A @ np.asarray(u))
        assert r / np.linalg.norm(b) < 1e-3
        # FMG then a few more cycles reaches solver accuracy
        u2, hist = topo.solve_topo(hier, hier.b_levels[0], num_cycles=8,
                                   use_fmg=True)
        np.testing.assert_allclose(np.asarray(u2), np.linalg.solve(A, b),
                                   rtol=1e-8)

    def test_matches_structured_solver_solution(self):
        """The general-DOF path and the structured grid path solve the same
        discrete system (same assembled operator), so their converged
        solutions agree to solver tolerance."""
        from tpu_multigrid import MultigridConfig, PoissonProblem
        from tpu_multigrid.cycles import solve_until_tol

        hier = topo.build_structured_topo_hierarchy(4, 2, dtype=jnp.float64)
        u_t, _ = topo.solve_topo(hier, hier.b_levels[0], num_cycles=20)

        cfg = MultigridConfig(finest_level=4, coarsest_level=2,
                              dtype=jnp.float64)
        prob = PoissonProblem(cfg)
        res = solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-12)
        u_g = grid_to_space(res.u, 16)
        np.testing.assert_allclose(np.asarray(u_t), u_g, atol=1e-10)

    def test_jit_compatible(self):
        import jax
        hier = topo.build_structured_topo_hierarchy(3, 1, dtype=jnp.float32)
        b = hier.b_levels[0]
        f = jax.jit(lambda h, b: topo.vcycle_topo(h, jnp.zeros_like(b), b))
        u = f(hier, b)
        r0 = np.linalg.norm(np.asarray(hier.ops[0].residual(
            jnp.zeros_like(b), b)))
        r1 = np.linalg.norm(np.asarray(hier.ops[0].residual(u, b)))
        assert r1 < 0.5 * r0


class TestSparseBuilder:
    """Vectorized production-size builder vs the dict/dense reference
    implementations (structured_transfer_fast / _stencil5_coo /
    build_structured_topo_hierarchy_sparse)."""

    def test_transfer_tables_match_metadata_path(self, rng):
        for nf in (4, 8, 16):
            mf, mc = (nf - 1) ** 2, (nf // 2 - 1) ** 2
            pf = rng.permutation(mf)
            pc = rng.permutation(mc)
            a = topo.structured_transfer(nf, perm_f=pf, perm_c=pc)
            b = topo.structured_transfer_fast(nf, perm_f=pf, perm_c=pc)
            # endpoint order within an edge pair is arbitrary (the
            # metadata path canonicalizes by topo id; prolong averages
            # both) — compare unordered pairs
            pa = np.sort(np.stack([np.asarray(a.src0),
                                   np.asarray(a.src1)]), axis=0)
            pb = np.sort(np.stack([np.asarray(b.src0),
                                   np.asarray(b.src1)]), axis=0)
            np.testing.assert_array_equal(pa, pb)
            np.testing.assert_array_equal(np.asarray(a.inj),
                                          np.asarray(b.inj))

    def test_coo_matches_element_assembly(self, rng):
        from tpu_multigrid.core.fem import assemble_from_elements
        n = 8
        m = (n - 1) ** 2
        perm = rng.permutation(m)
        A, bref = assemble_from_elements(n, 4.0)
        Ap = np.zeros_like(A)
        Ap[np.ix_(perm, perm)] = A
        r, c, v = topo._stencil5_coo(n, perm)
        As = np.zeros((m, m))
        As[r, c] = v
        np.testing.assert_allclose(As, Ap, atol=1e-12)

    def test_hierarchy_solves_like_dense_builder(self, rng):
        mfs = [(2 ** l - 1) ** 2 for l in (4, 3, 2)]
        perms = [rng.permutation(m) for m in mfs]
        hd = topo.build_structured_topo_hierarchy(4, 2, perms=perms,
                                                  dtype=jnp.float64)
        hs = topo.build_structured_topo_hierarchy_sparse(
            4, 2, perms=perms, dtype=jnp.float64)
        b = hd.b_levels[0]
        np.testing.assert_allclose(np.asarray(hs.b_levels[0]),
                                   np.asarray(b), atol=1e-12)
        ud, _ = topo.solve_topo(hd, b, num_cycles=12)
        us, hist = topo.solve_topo(hs, b, num_cycles=12)
        np.testing.assert_allclose(np.asarray(us), np.asarray(ud),
                                   atol=1e-10)
        assert float(hist[12]) / float(hist[0]) < 1e-9


class TestSolvePermuted:
    """The numbering-normalization route (topo.solve_permuted): factor
    A_topo = P A Pᵀ, run the structured path, permute twice per solve."""

    def test_matches_direct_solve(self, rng):
        level, n = 4, 16
        m = (n - 1) ** 2
        perm = rng.permutation(m)
        r, c, v = topo._stencil5_coo(n, perm)
        A = np.zeros((m, m))
        A[r, c] = v
        b = np.zeros(m)
        b[perm] = rng.standard_normal(m) * (1.0 / n) ** 2
        bj = jnp.asarray(b, jnp.float64)
        u, hist = topo.solve_permuted(level, bj, perm, num_cycles=25)
        np.testing.assert_allclose(np.asarray(u), np.linalg.solve(A, b),
                                   atol=1e-10)
        assert float(hist[20]) < 1e-10 * float(hist[0]) + 1e-300

    def test_identity_perm_matches_topo_path(self, rng):
        hier = topo.build_structured_topo_hierarchy_sparse(
            4, 2, dtype=jnp.float64)
        b = hier.b_levels[0]
        u_t, _ = topo.solve_topo(hier, b, num_cycles=25)
        u_p, _ = topo.solve_permuted(4, b, None, coarsest_level=2,
                                     num_cycles=25)
        np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_t),
                                   atol=1e-10)

    def test_permuted_matches_ell_route(self, rng):
        level, n = 5, 32
        mfs = [(2 ** l - 1) ** 2 for l in (5, 4, 3)]
        perms = [rng.permutation(m) for m in mfs]
        hier = topo.build_structured_topo_hierarchy_sparse(
            5, 3, perms=perms, dtype=jnp.float64)
        b = hier.b_levels[0]
        u_e, _ = topo.solve_topo(hier, b, num_cycles=40)
        u_p, _ = topo.solve_permuted(level, b, perms[0], num_cycles=25)
        np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_e),
                                   atol=1e-8)

    def test_convergence_beats_ell_transfers(self, rng):
        """The structured route's FW/bilinear transfers converge ~0.1/cycle
        where the v2 P1-edge topo transfers sit near 0.5-0.7."""
        hier = topo.build_structured_topo_hierarchy_sparse(
            5, 3, dtype=jnp.float64)
        b = hier.b_levels[0]
        _, h_p = topo.solve_permuted(5, b, None, num_cycles=8)
        h = np.asarray(h_p)
        assert h[6] / h[0] < 0.3 ** 6

    def test_prefer_structured_routing(self, rng):
        mfs = [(2 ** l - 1) ** 2 for l in (5, 4, 3)]
        perms = [rng.permutation(m) for m in mfs]
        hier = topo.build_structured_topo_hierarchy_sparse(
            5, 3, perms=perms, dtype=jnp.float64)
        b = hier.b_levels[0]
        u_r, h_r = topo.solve_topo(hier, b, num_cycles=12,
                                   prefer_structured=True)
        u_e, _ = topo.solve_topo(hier, b, num_cycles=40)
        np.testing.assert_allclose(np.asarray(u_r), np.asarray(u_e),
                                   atol=1e-8)
        # the structured route's rate, not the ELL tier's
        h = np.asarray(h_r)
        assert h[6] / h[0] < 0.3 ** 6
        # metadata survives the builder; device_put drops it gracefully
        import jax as _jax
        hd = _jax.device_put(hier)
        assert getattr(hd, "perm_structure", None) is None
        u_f, _ = topo.solve_topo(hd, b, num_cycles=3,
                                 prefer_structured=True)
        assert u_f.shape == u_e.shape

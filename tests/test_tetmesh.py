"""Unstructured 3D tetrahedral front end (tetmesh.py) -> topo.py
end-to-end: Bey red refinement, vectorized P1 tet assembly, and the same
dimension-agnostic gather-table transfer machinery the 2D mesh path uses,
validated against independent dense assemblies and direct solves on the
unit cube and the Fichera corner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid.tetmesh import (Tetrahedralization, assemble_dense_tet,
                                   boundary_vertex_mask3,
                                   build_tetmesh_hierarchy, fichera_mesh,
                                   refine3, unit_cube_mesh)
from tpu_multigrid.topo import fmg_topo, solve_topo


def _volumes(tet):
    pts = tet.vertices[tet.tets]
    M = pts[:, 1:] - pts[:, :1]
    return np.abs(np.linalg.det(M)) / 6.0


class TestMesh:
    def test_kuhn_cube_geometry(self):
        tet = unit_cube_mesh(1)
        assert tet.num_vertices == 8 and tet.num_tets == 6
        v = _volumes(tet)
        assert np.all(v > 0)
        np.testing.assert_allclose(v.sum(), 1.0, atol=1e-14)
        tet2 = unit_cube_mesh(2)
        np.testing.assert_allclose(_volumes(tet2).sum(), 1.0, atol=1e-13)

    def test_refine_counts_and_volumes(self):
        tet = unit_cube_mesh(1)
        # Kuhn cube edges: 12 cube edges + 6 face diagonals + 1 main
        r = refine3(tet)
        assert len(r.coarse_edges) == 19
        assert r.fine.num_vertices == 8 + 19
        assert r.fine.num_tets == 48
        v = _volumes(r.fine)
        assert np.all(v > 0)          # Bey children are nondegenerate
        np.testing.assert_allclose(v.sum(), 1.0, atol=1e-13)
        for e, (v0, v1) in r.coarse_edges.items():
            np.testing.assert_allclose(
                r.fine.vertices[8 + e],
                0.5 * (tet.vertices[v0] + tet.vertices[v1]))

    def test_boundary_detection(self):
        tet = unit_cube_mesh(1)
        assert boundary_vertex_mask3(tet).all()
        r = refine3(tet)
        inner = ~boundary_vertex_mask3(r.fine)
        # the only interior vertex of the refined unit cube is the center
        assert inner.sum() == 1
        np.testing.assert_allclose(r.fine.vertices[inner][0],
                                   [0.5, 0.5, 0.5])
        # Fichera: re-entrant corner (1,1,1) IS on the boundary
        fic = fichera_mesh()
        assert boundary_vertex_mask3(fic).all()

    def test_assembly_matches_element_loop_oracle(self):
        """Vectorized assembly == an independent per-element python loop
        with explicitly integrated P1 gradients (refined Fichera)."""
        tet = refine3(fichera_mesh()).fine
        A_u, b_u, space = assemble_dense_tet(tet, 1.0)
        m = b_u.shape[0]
        A_o = np.zeros((m, m))
        b_o = np.zeros(m)
        for t in range(tet.num_tets):
            nodes = tet.tets[t]
            p = tet.vertices[nodes]
            M = p[1:] - p[0]
            vol = abs(np.linalg.det(M)) / 6.0
            Minv = np.linalg.inv(M)
            grads = np.zeros((4, 3))
            grads[1:] = Minv.T
            grads[0] = -grads[1:].sum(axis=0)
            ke = vol * grads @ grads.T
            fe = vol / 4.0
            ids = space[nodes]
            for a in range(4):
                if ids[a] < 0:
                    continue
                b_o[ids[a]] += fe
                for bb in range(4):
                    if ids[bb] >= 0:
                        A_o[ids[a], ids[bb]] += ke[a, bb]
        np.testing.assert_allclose(A_u, A_o, atol=1e-12)
        np.testing.assert_allclose(b_u, b_o, atol=1e-14)

    def test_stiffness_annihilates_linears(self):
        """Interior rows of the full (no-elimination) stiffness kill any
        linear function — the P1 patch test."""
        tet = refine3(unit_cube_mesh(2)).fine
        nodirich = np.zeros(tet.num_vertices, bool)
        A, _, space = assemble_dense_tet(tet, 0.0, dirichlet=nodirich)
        lin = (1.0 + 2.0 * tet.vertices[:, 0] - 3.0 * tet.vertices[:, 1]
               + 0.5 * tet.vertices[:, 2])
        res = A @ lin[np.argsort(space)]   # space is identity here
        interior = ~boundary_vertex_mask3(tet)
        np.testing.assert_allclose(res[space[interior]], 0.0, atol=1e-12)


class TestTransfers:
    def test_restrict_is_transpose_and_galerkin(self):
        """Variational mode: dense realizations satisfy R == P^T and the
        nested-P1 Galerkin identity A_c == P^T A_f P (what makes the
        re-assembled coarse levels variational in 3D too)."""
        hier, meshes = build_tetmesh_hierarchy(fichera_mesh(), 3, 1.0,
                                               dtype=jnp.float64)
        t = hier.transfers[0]
        mf, mc = t.m_fine, t.m_coarse
        P = np.zeros((mf, mc))
        for j in range(mc):
            ej = jnp.zeros((mc,), jnp.float64).at[j].set(1.0)
            P[:, j] = np.asarray(t.prolong(ej))
        R = np.zeros((mc, mf))
        for i in range(mf):
            ei = jnp.zeros((mf,), jnp.float64).at[i].set(1.0)
            R[:, i] = np.asarray(t.restrict(ei))
        np.testing.assert_allclose(R, P.T, atol=1e-14)
        A_f, _, _ = assemble_dense_tet(meshes[0], 1.0)
        A_c, _, _ = assemble_dense_tet(meshes[1], 1.0)
        np.testing.assert_allclose(P.T @ A_f @ P, A_c, atol=1e-11)


class TestSolve:
    def test_direct_o_h2_convergence(self):
        """u = sin(pi x) sin(pi y) sin(pi z) on the unit cube through the
        tet path: direct solves of per-level assemblies converge O(h^2)
        at the nodes."""
        def f(x, y, z):
            return (3 * np.pi ** 2 * np.sin(np.pi * x)
                    * np.sin(np.pi * y) * np.sin(np.pi * z))

        errs = []
        tet = unit_cube_mesh(2)
        for _ in range(3):
            tet = refine3(tet).fine
            A, b, space = assemble_dense_tet(tet, f)
            u = np.linalg.solve(A, b)
            exact = (np.sin(np.pi * tet.vertices[:, 0])
                     * np.sin(np.pi * tet.vertices[:, 1])
                     * np.sin(np.pi * tet.vertices[:, 2]))
            interior = space >= 0
            errs.append(np.max(np.abs(u[space[interior]]
                                      - exact[interior])))
        rate = errs[0] / errs[1], errs[1] / errs[2]
        assert rate[0] > 3.5 and rate[1] > 3.5, (errs, rate)

    def test_mg_matches_direct_fichera(self):
        """V-cycles on the Fichera hierarchy reach the direct solution of
        the same fine assembly (f64): metadata -> gather -> ELL -> cycle,
        end-to-end on a genuinely unstructured 3D mesh."""
        hier, meshes = build_tetmesh_hierarchy(fichera_mesh(), 3, 1.0,
                                               dtype=jnp.float64)
        A, b_np, _ = assemble_dense_tet(meshes[0], 1.0)
        u_direct = np.linalg.solve(A, b_np)
        u, hist = jax.jit(lambda h, bb: solve_topo(h, bb, num_cycles=22))(
            hier, hier.b_levels[0])
        h = np.asarray(hist)
        assert h[-1] / h[0] < 1e-9, h
        np.testing.assert_allclose(np.asarray(u), u_direct, atol=1e-8)

    def test_h_independent_rate_fichera(self):
        """Per-cycle contraction on the Fichera corner stays bounded as h
        shrinks (variational nested P1 + damped Jacobi)."""
        rates = []
        for levels in (3, 4):
            hier, _ = build_tetmesh_hierarchy(fichera_mesh(), levels, 1.0,
                                              dtype=jnp.float64)
            _, hist = solve_topo(hier, hier.b_levels[0], num_cycles=8)
            h = np.asarray(hist)
            rates.append((h[8] / h[2]) ** (1.0 / 6.0))
        assert all(r < 0.45 for r in rates), rates
        assert rates[-1] < rates[0] + 0.1, rates

    def test_fmg_topo_fichera(self):
        hier, _ = build_tetmesh_hierarchy(fichera_mesh(), 3, 1.0,
                                          dtype=jnp.float64)
        u_fmg = fmg_topo(hier, nu0=4, dtype=jnp.float64)
        op = hier.ops[0]
        b = hier.b_levels[0]
        r0 = float(jnp.linalg.norm(b))
        r = float(jnp.linalg.norm(op.residual(u_fmg, b)))
        assert r / r0 < 5e-3, r / r0

    def test_injection_mode_converges_cube(self):
        """Non-variational injection with the 3D 2^d row-sum scale (8.0)
        still converges on the structured Kuhn cube."""
        hier, _ = build_tetmesh_hierarchy(unit_cube_mesh(2), 3, 6.0,
                                          variational=False,
                                          dtype=jnp.float64)
        _, hist = solve_topo(hier, hier.b_levels[0], num_cycles=20)
        h = np.asarray(hist)
        assert h[-1] / h[0] < 1e-6, h

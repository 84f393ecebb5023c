"""Distributed topo tier (dist/topo.py): 1D DOF-row GSPMD partitioning
of TopoHierarchy solves.  Flips the family matrix's last distributed
dash — the reference's v2 arbitrary-DOF design
(``Multigrid_functions.cpp:16-26``) now runs on a device mesh.

Row-block arithmetic is unchanged by the level padding (rows are only
appended), so the distributed trajectories must match the single-chip
solves to roundoff on all three TopoHierarchy producers: structured
(with a DOF permutation), L-shape trimesh (variational transfers), and
the 3D Fichera tetmesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid import topo
from tpu_multigrid.dist.mesh import make_grid_mesh
from tpu_multigrid.dist.topo import gspmd_solve_topo, pad_topo_hierarchy


def _history_match(hier, b, mesh, *, use_fmg=False, num_cycles=6, **kw):
    """Distributed trajectory == single-chip to roundoff: reductions
    still far from the f32 floor match tightly; entries approaching the
    floor only loosely (reduction-order noise dominates there)."""
    u_ref, h_ref = topo.solve_topo(hier, b, num_cycles=num_cycles,
                                   use_fmg=use_fmg, **kw)
    u_d, h_d = gspmd_solve_topo(hier, b, mesh, num_cycles=num_cycles,
                                use_fmg=use_fmg, **kw)
    assert u_d.shape == u_ref.shape
    h_d, h_ref = np.asarray(h_d), np.asarray(h_ref)
    shallow = h_ref / max(h_ref[0], 1e-30) >= 1e-3
    np.testing.assert_allclose(h_d[shallow], h_ref[shallow], rtol=2e-5)
    np.testing.assert_allclose(h_d[~shallow], h_ref[~shallow], rtol=0.05)
    np.testing.assert_allclose(np.asarray(u_d), np.asarray(u_ref),
                               rtol=1e-4, atol=1e-6)
    return h_d


class TestPadding:
    def test_padded_sizes_and_invariant(self):
        hier = topo.build_structured_topo_hierarchy(4, 2,
                                                    dtype=jnp.float64)
        ph, real = pad_topo_hierarchy(hier, 8)
        assert real == tuple(op.m for op in hier.ops)
        for op, m in zip(ph.ops, real):
            assert op.m % 8 == 0 and op.m > m
            # pad rows are inert: zero coefficients, zero d_inv
            assert float(jnp.abs(op.vals[m:]).max()) == 0.0
            assert float(jnp.abs(op.d_inv[m:]).max()) == 0.0
        # one padded V-cycle keeps every pad slot exactly zero
        b = ph.b_levels[0]
        u = topo.vcycle_topo(ph, jnp.zeros_like(b), b)
        assert float(jnp.abs(u[real[0]:]).max()) == 0.0

    def test_padded_equals_unpadded_single_device(self):
        hier = topo.build_structured_topo_hierarchy(4, 2,
                                                    dtype=jnp.float64)
        ph, real = pad_topo_hierarchy(hier, 8)
        b = hier.b_levels[0]
        b_p = ph.b_levels[0]
        u_ref, h_ref = topo.solve_topo(hier, b, num_cycles=5)
        u_p, h_p = topo.solve_topo(ph, b_p, num_cycles=5)
        # identical row arithmetic except the zero-embedded dense coarse
        # matvec, whose larger shape reassociates the same terms -> f64
        # roundoff, not bitwise
        np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(u_p[:real[0]]),
                                   np.asarray(u_ref), rtol=1e-10,
                                   atol=1e-14)


class TestStructured:
    @pytest.mark.parametrize("mesh_shape", [(4, 1), (2, 2), (4, 2)])
    def test_matches_single_chip(self, mesh_shape):
        my, mx = mesh_shape
        hier = topo.build_structured_topo_hierarchy(4, 2,
                                                    dtype=jnp.float32)
        mesh = make_grid_mesh(shape=mesh_shape,
                              devices=jax.devices()[: my * mx])
        h = _history_match(hier, hier.b_levels[0], mesh)
        assert h[-1] < 1e-3 * h[0]

    def test_permuted_dofs_fmg(self):
        """A random DOF permutation (the topo_to_space generality) +
        v2 FMG semantics through the distributed path."""
        rng = np.random.default_rng(7)
        perms = [rng.permutation((2 ** l - 1) ** 2) for l in (4, 3, 2)]
        # f64: the FMG start puts the whole history near the f32 floor,
        # where cross-path reduction-order noise swamps any tolerance
        hier = topo.build_structured_topo_hierarchy(
            4, 2, perms=perms, dtype=jnp.float64)
        mesh = make_grid_mesh(shape=(8, 1), devices=jax.devices()[:8])
        _history_match(hier, hier.b_levels[0], mesh, use_fmg=True,
                       num_cycles=3)

    def test_mesh_kwarg_dispatch(self):
        hier = topo.build_structured_topo_hierarchy(3, 2,
                                                    dtype=jnp.float32)
        mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
        u, h = topo.solve_topo(hier, hier.b_levels[0], num_cycles=4,
                               mesh=mesh)
        assert u.shape == (hier.ops[0].m,)
        assert np.asarray(h)[-1] < 1e-2 * np.asarray(h)[0]


class TestUnstructured:
    def test_lshape_trimesh(self):
        from tpu_multigrid.trimesh import build_mesh_hierarchy, lshape_mesh
        hier, _ = build_mesh_hierarchy(lshape_mesh(), 3, 1.0,
                                       dtype=jnp.float32)
        mesh = make_grid_mesh(shape=(8, 1), devices=jax.devices()[:8])
        h = _history_match(hier, hier.b_levels[0], mesh)
        assert h[-1] < 1e-2 * h[0]

    @pytest.mark.slow
    def test_fichera_tetmesh(self):
        from tpu_multigrid.tetmesh import (build_tetmesh_hierarchy,
                                           fichera_mesh)
        hier, _ = build_tetmesh_hierarchy(fichera_mesh(), 3, 1.0,
                                          dtype=jnp.float32)
        mesh = make_grid_mesh(shape=(4, 1), devices=jax.devices()[:4])
        h = _history_match(hier, hier.b_levels[0], mesh, num_cycles=5)
        assert h[-1] < 1e-2 * h[0]

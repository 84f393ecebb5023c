"""Multi-slice (DCN) mesh layout (dist/mesh.py::make_grid_mesh).

On multi-slice TPU topologies the inter-slice links (DCN) are an order
of magnitude slower than ICI, so the decomposition must confine
slice-crossing halo exchanges to as few mesh boundaries as possible.
``make_grid_mesh(dcn_slices=k)`` guarantees each slice owns a contiguous
band of ``gy`` rows — verified here on virtual CPU devices, along with
solve parity on the hybrid layout (the solver stack is mesh-layout
agnostic; only performance depends on it).
"""

import numpy as np
import pytest

import jax

from tpu_multigrid import MultigridConfig
from tpu_multigrid.dist import make_grid_mesh
from tpu_multigrid.dist.mesh import dcn_boundary_rows
from tpu_multigrid.dist.shard_cycle import sharded_solve


class TestLayout:
    def test_bands_are_contiguous_chunks(self):
        devs = jax.devices()[:8]
        mesh = make_grid_mesh(devices=devs, dcn_slices=2)
        my, mx = mesh.devices.shape
        assert my % 2 == 0
        rows_per = my // 2
        # each band's device set == one consecutive chunk of the input
        for s in range(2):
            band = mesh.devices[s * rows_per: (s + 1) * rows_per].ravel()
            chunk = devs[s * 4: (s + 1) * 4]
            assert {d.id for d in band} == {d.id for d in chunk}

    def test_explicit_shape(self):
        devs = jax.devices()[:8]
        mesh = make_grid_mesh(shape=(4, 2), devices=devs, dcn_slices=4)
        assert mesh.devices.shape == (4, 2)
        assert dcn_boundary_rows(mesh, 4) == (0, 1, 2)

    def test_boundary_rows(self):
        devs = jax.devices()[:8]
        mesh = make_grid_mesh(devices=devs, dcn_slices=2)
        assert dcn_boundary_rows(mesh, 2) == (mesh.devices.shape[0] // 2
                                              - 1,)

    def test_rejects_indivisible(self):
        devs = jax.devices()[:6]
        with pytest.raises(ValueError):
            make_grid_mesh(devices=devs, dcn_slices=4)
        with pytest.raises(ValueError):
            make_grid_mesh(shape=(3, 2), devices=devs, dcn_slices=2)


class TestSolveParity:
    def test_hybrid_mesh_matches_single_device(self):
        cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                              dtype=np.float32, mesh_shape=(4, 2))
        mesh = make_grid_mesh(shape=(4, 2), devices=jax.devices()[:8],
                              dcn_slices=2)
        res, _ = sharded_solve(cfg, mesh, num_cycles=3, tol=0.0,
                               replicate_below=8)
        mesh1 = make_grid_mesh(shape=(1, 1), devices=jax.devices()[:1])
        cfg1 = MultigridConfig(finest_level=5, coarsest_level=3,
                               dtype=np.float32, mesh_shape=(1, 1))
        res1, _ = sharded_solve(cfg1, mesh1, num_cycles=3, tol=0.0,
                                replicate_below=8)
        np.testing.assert_allclose(np.asarray(res.res_history),
                                   np.asarray(res1.res_history),
                                   rtol=1e-12)

"""Distributed mixed Dirichlet/Neumann BCs (box operators on shards).

VERDICT r3 next #5: shard-local box masks in the var ops and transfers,
the FEM-weighted RHS through sharded_solve(b0=...), Galerkin box
nesting, and solve_poisson(neumann=..., mesh=...).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig
from tpu_multigrid.core import ops
from tpu_multigrid.dist import local_ops as L
from tpu_multigrid.dist import local_var as V
from tpu_multigrid.dist.mesh import make_grid_mesh, place
from tpu_multigrid.problems.mixedbc import _box_of, mixed_poisson_op

SPEC = P("gy", "gx")


def _shard_apply(mesh, fn, *arrays):
    f = shard_map(fn, mesh=mesh, in_specs=(SPEC,) * len(arrays),
                  out_specs=SPEC, check_vma=False)
    return jax.jit(f)(*(place(a, mesh) for a in arrays))


@pytest.mark.parametrize("mesh_shape", [(2, 2), (2, 4)])
def test_local_box_ops_match_global(mesh_shape, rng):
    my, mx = mesh_shape
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    n, S = 60, 64
    neumann = ("bottom", "right")
    op = mixed_poisson_op(n, S, neumann, dtype=np.float64)
    box = op.box
    i0, i1, j0, j1 = box
    u = np.zeros((S, S))
    b = np.zeros((S, S))
    u[i0: i1 + 1, j0: j1 + 1] = rng.standard_normal((i1 - i0 + 1,
                                                     j1 - j0 + 1))
    b[i0: i1 + 1, j0: j1 + 1] = rng.standard_normal((i1 - i0 + 1,
                                                     j1 - j0 + 1))
    u, b = jnp.asarray(u), jnp.asarray(b)
    coef = jnp.asarray(op.coef)
    invd = jnp.asarray(op.inv_diag)
    cspec = P(None, None, "gy", "gx")

    def run_var(fn):
        f = shard_map(fn, mesh=mesh,
                      in_specs=(SPEC, SPEC, cspec, SPEC),
                      out_specs=SPEC, check_vma=False)
        from jax.sharding import NamedSharding
        cplace = jax.device_put(coef, NamedSharding(mesh, cspec))
        return jax.jit(f)(place(u, mesh), place(b, mesh), cplace,
                          place(invd, mesh))

    got = run_var(lambda ul, bl, cl, dl: V.var_residual_local(
        ul, bl, cl, n, box=box))
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(op.residual(u, b)),
                               rtol=1e-12, atol=1e-13)
    got_j = run_var(lambda ul, bl, cl, dl: V.var_jacobi_local(
        ul, bl, cl, dl, n, 2 / 3, 3, box=box))
    want_j = op.smooth(u, b, smoother="jacobi", omega=2 / 3, sweeps=3)
    np.testing.assert_allclose(np.asarray(got_j), np.asarray(want_j),
                               rtol=1e-12, atol=1e-13)
    got_g = run_var(lambda ul, bl, cl, dl: V.var_rbgs_local(
        ul, bl, cl, dl, n, 2, box=box))
    want_g = op.smooth(u, b, smoother="rbgs", omega=2 / 3, sweeps=2)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=1e-12, atol=1e-13)

    # box transfers (coarse box nests: fine 2I <-> coarse I)
    nc = n // 2
    cbox = _box_of(nc, frozenset(neumann))
    f = shard_map(lambda rl: L.restrict_fw_local(rl, n, box=cbox),
                  mesh=mesh, in_specs=(SPEC,), out_specs=SPEC,
                  check_vma=False)
    got_r = jax.jit(f)(place(b, mesh))
    want_r = ops.restrict_fw(b, n, S // 2, box=cbox)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=1e-12, atol=1e-13)

    ec = np.zeros((S // 2, S // 2))
    ec[cbox[0]: cbox[1] + 1, cbox[2]: cbox[3] + 1] = rng.standard_normal(
        (cbox[1] - cbox[0] + 1, cbox[3] - cbox[2] + 1))
    ec = jnp.asarray(ec)
    g = shard_map(lambda el: L.prolong_local(el, nc, box=box), mesh=mesh,
                  in_specs=(SPEC, ), out_specs=SPEC, check_vma=False)
    got_p = jax.jit(g)(place(ec, mesh))
    want_p = ops.prolong(ec, nc, S, box=box)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("neumann", [("bottom",), ("bottom", "right")])
def test_mesh_mixedbc_matches_single_chip(neumann):
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    res = mg.solve_poisson(6, config=cfg, neumann=neumann,
                           mesh=mesh, num_cycles=6, tol=None)
    ref = mg.solve_poisson(6, config=cfg, neumann=neumann,
                           num_cycles=6, tol=None)
    h = np.asarray(res.res_history)
    hr = np.asarray(ref.res_history)
    # f32 floor for the corner-Neumann case sits near 1e-4 relative at
    # this size; compare tightly above it, loosely in the floor region.
    shallow = hr / hr[0] >= 1e-3
    np.testing.assert_allclose((h / h[0])[shallow], (hr / hr[0])[shallow],
                               rtol=2e-3)
    np.testing.assert_allclose((h / h[0])[~shallow],
                               (hr / hr[0])[~shallow], rtol=0.2)
    n = 64
    np.testing.assert_allclose(np.asarray(res.u)[: n + 1, : n + 1],
                               np.asarray(ref.u)[: n + 1, : n + 1],
                               rtol=2e-4, atol=1e-7)


def test_mesh_mixedbc_manufactured_inhomogeneous_exact():
    """u* = (x^2 + x) y(1-y), Neumann left/right with nonzero g: the
    5-point stencil and ghost-reflection closures difference separable
    quadratics exactly, so the distributed discrete solution equals the
    manufactured one to solver tolerance (test_mixedbc.py's case on a
    (2,2) mesh, f64)."""
    def forcing(x, y):
        return -2.0 * y * (1 - y) + 2.0 * (x * x + x)

    def g(x, y):
        return jnp.where(x < 0.5, -y * (1 - y), 3.0 * y * (1 - y))

    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float64)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    n = 32
    res = mg.solve_poisson(5, config=cfg, neumann=("left", "right"),
                           neumann_value=g, forcing=forcing, mesh=mesh,
                           tol=1e-11, max_cycles=60)
    assert bool(res.converged)
    x = np.arange(n + 1) / n
    want = ((x ** 2 + x)[None, :]
            * (x * (1 - x))[:, None])
    got = np.asarray(res.u)[: n + 1, : n + 1]
    assert np.abs(got - want).max() < 1e-9

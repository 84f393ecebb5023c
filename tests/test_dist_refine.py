"""Distributed compensated iterative refinement (dist/refine.py).

VERDICT r3 next #1: op-level 1-vs-N parity of the compensated pieces at
1e-12 (f64), f32 end-to-end floor-breaking on virtual meshes, parity of
the refined iterate against the single-chip precision tier, and the API
gate (``solve_poisson(mesh=..., refined=True)``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

import tpu_multigrid as mg
from tpu_multigrid import MultigridConfig, precision
from tpu_multigrid.core import ops
from tpu_multigrid.dist import refine as R
from tpu_multigrid.dist.mesh import make_grid_mesh, place
from tpu_multigrid.dist.refine import refined_sharded_solve

SPEC = P("gy", "gx")


def _shard_apply(mesh, fn, *arrays):
    f = shard_map(fn, mesh=mesh, in_specs=(SPEC,) * len(arrays),
                  out_specs=SPEC, check_vma=False)
    return jax.jit(f)(*(place(a, mesh) for a in arrays))


def _grids(n, S, rng, k, dtype=jnp.float64, scale=1.0):
    outs = []
    for i in range(k):
        a = np.zeros((S, S))
        a[1:n, 1:n] = rng.standard_normal((n - 1, n - 1)) * scale
        outs.append(jnp.asarray(a, dtype))
    return outs


# ---------------------------------------------------------------------------
# Op-level 1-vs-N parity (f64, 1e-12): compensated residuals + prolongation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mesh_shape", [(2, 4), (2, 2), (1, 2)])
def test_ds_residual_local_matches_global(mesh_shape, rng):
    my, mx = mesh_shape
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    n, S = 60, 64
    b, uh = _grids(n, S, rng, 2)
    # u_lo at rounding scale relative to u_hi, like a real ds pair
    (ul,) = _grids(n, S, rng, 1, scale=1e-9)
    got = _shard_apply(mesh, lambda bl, hl, ll: R.ds_residual_local(
        bl, hl, ll, n), b, uh, ul)
    want = precision.ds_residual(b, uh, ul, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (2, 2)])
def test_ts_residual_local_matches_global(mesh_shape, rng):
    my, mx = mesh_shape
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    n, S = 60, 64
    b, uh = _grids(n, S, rng, 2)
    (um,) = _grids(n, S, rng, 1, scale=1e-9)
    (ul,) = _grids(n, S, rng, 1, scale=1e-18)
    got = _shard_apply(mesh, lambda bl, hl, ml, ll: R.ts_residual_local(
        bl, hl, ml, ll, n), b, uh, um, ul)
    want = precision.ts_residual(b, uh, um, ul, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (2, 2)])
def test_prolong_comp_local_matches_global(mesh_shape, rng):
    my, mx = mesh_shape
    mesh = make_grid_mesh(shape=mesh_shape, devices=jax.devices()[: my * mx])
    nc, Sc, Sf = 30, 32, 64
    (ec,) = _grids(nc, Sc, rng, 1)
    f = shard_map(lambda el: R.prolong_comp_local(el, nc), mesh=mesh,
                  in_specs=(SPEC,), out_specs=(SPEC, SPEC), check_vma=False)
    hi, err = jax.jit(f)(place(ec, mesh))
    whi, werr = precision.prolong_comp(ec, nc, Sf)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(whi),
                               rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(np.asarray(err), np.asarray(werr),
                               rtol=1e-13, atol=1e-15)
    # hi + err == P ec exactly (the pair is an error-free transformation)
    want_sum = np.asarray(ops.prolong(ec, nc, Sf))
    np.testing.assert_allclose(np.asarray(hi) + np.asarray(err), want_sum,
                               rtol=1e-13, atol=1e-16)


def test_ds_residual_local_f32_bitwise_matches_single_chip(rng):
    """In f32 (the production dtype) the shard-local compensated residual
    must evaluate the IDENTICAL TwoSum cascade as the single-chip tier:
    same per-node computation tree -> bitwise-equal results, which is
    what makes 1-chip and N-chip refined trajectories comparable."""
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    n, S = 60, 64
    b64, u64 = _grids(n, S, rng, 2)
    u_hi = u64.astype(jnp.float32)
    u_lo = ((u64 - u_hi.astype(jnp.float64)) * 0.5).astype(jnp.float32)
    b32 = b64.astype(jnp.float32)
    got = _shard_apply(mesh, lambda bl, hl, ll: R.ds_residual_local(
        bl, hl, ll, n), b32, u_hi, u_lo)
    want = precision.ds_residual(b32, u_hi, u_lo, n)
    assert np.array_equal(np.asarray(got), np.asarray(want))


# ---------------------------------------------------------------------------
# End-to-end: N-way refined solve == 1-way == single-chip precision tier
# ---------------------------------------------------------------------------

def _single_chip_refined(cfg, ts, ds_levels, num_cycles):
    prob = mg.PoissonProblem(cfg)
    b = prob.rhs()
    if ts:
        out = precision.solve_refined_ts(prob.hierarchy, cfg, b, tol=None,
                                         num_cycles=num_cycles,
                                         ds_levels=ds_levels)
        return out[0], np.asarray(out[3])
    out = precision.solve_refined_ds(prob.hierarchy, cfg, b, tol=None,
                                     num_cycles=num_cycles,
                                     ds_levels=ds_levels)
    return out[0], np.asarray(out[2])


@pytest.mark.parametrize("ts,ds_levels", [(False, 0), (False, 2), (True, 2)])
def test_refined_sharded_matches_single_chip(ts, ds_levels):
    """The distributed refined trajectory matches the single-chip
    precision tier (same compensated arithmetic per node), and mesh
    shapes agree with each other."""
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    want_u, want_h = _single_chip_refined(cfg, ts, ds_levels, num_cycles=5)
    histories = [want_h]
    for shape in [(1, 1), (2, 2)]:
        my, mx = shape
        mesh = make_grid_mesh(shape=shape, devices=jax.devices()[: my * mx])
        res, levels = refined_sharded_solve(
            cfg, mesh, num_cycles=5, ts=ts, ds_levels=ds_levels,
            replicate_below=8)
        h = np.asarray(res.res_history)
        histories.append(h)
        n = 64
        np.testing.assert_allclose(
            np.asarray(res.u)[: n + 1, : n + 1],
            np.asarray(want_u)[: n + 1, : n + 1], rtol=2e-5, atol=1e-9)
    # trajectories agree across 1-chip/1-way/4-way to f32 roundoff
    for h in histories[1:]:
        np.testing.assert_allclose(h, histories[0], rtol=2e-4)


def test_refined_sharded_breaks_f32_floor():
    """At level 6 a plain f32 sharded solve cannot measure deep
    reductions (residual floor ~3e-5 relative, CLAUDE.md); the refined
    sharded solve reaches 1e-9."""
    from tpu_multigrid.dist.shard_cycle import sharded_solve
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    plain, _ = sharded_solve(cfg, mesh, tol=1e-9, max_cycles=40,
                             replicate_below=8)
    ph = np.asarray(plain.res_history)
    ph = ph[np.isfinite(ph)]
    assert ph[-1] / ph[0] > 1e-7, "plain f32 unexpectedly reached 1e-7"

    res, _ = refined_sharded_solve(cfg, mesh, tol=1e-9, max_iters=40,
                                   replicate_below=8)
    h = np.asarray(res.res_history)
    h = h[np.isfinite(h)]
    assert bool(res.converged), h
    assert h[-1] / h[0] <= 1e-9, h


def test_refined_sharded_ts_deeper_than_ds():
    """ts + ds_levels keeps converging where it at least matches ds
    (at small grids both reach very deep; assert ts is no worse)."""
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float32)
    mesh = make_grid_mesh(shape=(1, 2), devices=jax.devices()[:2])
    ds, _ = refined_sharded_solve(cfg, mesh, num_cycles=12,
                                  replicate_below=8)
    ts, _ = refined_sharded_solve(cfg, mesh, num_cycles=12, ts=True,
                                  ds_levels=2, replicate_below=8)
    dh = np.asarray(ds.res_history)
    th = np.asarray(ts.res_history)
    assert np.isfinite(th).all() and np.isfinite(dh).all()
    assert th[-1] <= dh[-1] * 1.5, (th[-1], dh[-1])


def test_api_mesh_refined():
    """solve_poisson(mesh=..., refined=True) is accepted and converges
    (the api.py gate removal, VERDICT r3 next #1 'done' criterion)."""
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    cfg = MultigridConfig(finest_level=6, coarsest_level=3,
                          dtype=jnp.float32)
    res = mg.solve_poisson(6, config=cfg, mesh=mesh, tol=1e-8,
                           max_cycles=40)
    # plain mesh solve stalls well above 1e-8 in f32...
    assert not bool(res.converged)
    rres = mg.solve_poisson(6, config=cfg, mesh=mesh, tol=1e-8,
                            max_cycles=40, refined=True)
    # ...the refined mesh solve reaches it
    assert bool(rres.converged)
    h = np.asarray(rres.res_history)
    h = h[np.isfinite(h)]
    assert h[-1] / h[0] <= 1e-8

    # and the solution matches the single-chip refined solve
    sres = mg.solve_poisson(6, config=cfg, tol=1e-8, max_cycles=40,
                            refined=True)
    n = 64
    np.testing.assert_allclose(
        np.asarray(rres.u)[: n + 1, : n + 1],
        np.asarray(sres.u)[: n + 1, : n + 1], rtol=2e-5, atol=1e-9)


def test_api_mesh_refined_rejects_var():
    mesh = make_grid_mesh(shape=(1, 2), devices=jax.devices()[:2])
    from tpu_multigrid.api import _solve_on_mesh
    cfg = MultigridConfig(finest_level=5, coarsest_level=3)
    with pytest.raises(ValueError, match="constant Poisson"):
        _solve_on_mesh(cfg, mesh, forcing=4.0, u0=None, tol=1e-6,
                       max_cycles=5, num_cycles=None, use_fmg=False,
                       dist_path="jnp", jit=True,
                       coefficient=lambda x, y: 1 + x, refined=True)


def test_refined_sharded_fixed_count_and_u0(rng):
    """num_cycles runs exactly that many refinement iterations; seeding
    with the full ds pair (u0 + u0_lo) resumes at the stopped residual
    (seeding only the hi part would floor at the f32 representation
    error — the reason u0_lo exists, mirroring solve_refined_ds)."""
    cfg = MultigridConfig(finest_level=5, coarsest_level=2,
                          dtype=jnp.float32)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    res, levels, comps = refined_sharded_solve(cfg, mesh, num_cycles=4,
                                               replicate_below=8,
                                               return_parts=True)
    assert int(res.iterations) == 4
    h = np.asarray(res.res_history)
    assert np.isfinite(h).all()

    res2, _ = refined_sharded_solve(cfg, mesh, num_cycles=2,
                                    replicate_below=8,
                                    u0=np.asarray(comps[0]),
                                    u0_lo=np.asarray(comps[1]))
    h2 = np.asarray(res2.res_history)
    # resumed initial residual == the stopped solve's final residual
    np.testing.assert_allclose(h2[0], h[4], rtol=1e-4)
    assert h2[0] < 5e-3 * h[0], (h2[0], h[0])

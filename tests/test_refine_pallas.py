"""Compensated-refinement kernels on extended blocks (kernels/localref.py)
and the fused-tier distributed refined driver (dist/refine_pallas.py).

Interpret-mode kernel checks run single-launch (no shard_map); the
end-to-end interpret+shard_map runs use <= 4 devices (the 1-core
interpret deadlock bound, CLAUDE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_multigrid import MultigridConfig, precision
from tpu_multigrid.core import ops
from tpu_multigrid.dist.mesh import make_grid_mesh
from tpu_multigrid.dist.refine import refined_sharded_solve
from tpu_multigrid.dist.refine_pallas import refined_sharded_solve_pallas
from tpu_multigrid.kernels import localref as KR
from tpu_multigrid.kernels.local import GR, GC


def _embed_ext(a):
    """(S, S) global grid -> extended block of a (1,1)-mesh shard (ghosts
    zero, which equals the zero-outside-interior invariant)."""
    S = a.shape[0]
    ext = jnp.zeros((S + 2 * GR, S + 2 * GC), a.dtype)
    return ext.at[GR: GR + S, GC: GC + S].set(a)


def _own(ext, S):
    return np.asarray(ext)[GR: GR + S, GC: GC + S]


_ORIGIN = jnp.asarray([[-GR, -GC]], jnp.int32)


def _rand_grid(n, S, rng, scale=1.0, dtype=jnp.float32):
    a = np.zeros((S, S), np.float64)
    a[1:n, 1:n] = rng.standard_normal((n - 1, n - 1)) * scale
    return jnp.asarray(a, dtype)


def test_ds_residual_ext_matches_jnp(rng):
    n, S = 250, 256
    b = _rand_grid(n, S, rng)
    uh = _rand_grid(n, S, rng)
    ul = _rand_grid(n, S, rng, scale=1e-8)
    with pltpu.force_tpu_interpret_mode():
        got = KR.ds_residual_ext(_embed_ext(b), _embed_ext(uh),
                                 _embed_ext(ul), _ORIGIN, n)
        got.block_until_ready()
    want = np.asarray(precision.ds_residual(b, uh, ul, n))
    assert np.array_equal(_own(got, S), want)


def test_ts_residual_ext_matches_jnp(rng):
    n, S = 250, 256
    b = _rand_grid(n, S, rng)
    uh = _rand_grid(n, S, rng)
    um = _rand_grid(n, S, rng, scale=1e-8)
    ul = _rand_grid(n, S, rng, scale=1e-15)
    with pltpu.force_tpu_interpret_mode():
        got = KR.ts_residual_ext(_embed_ext(b), _embed_ext(uh),
                                 _embed_ext(um), _embed_ext(ul),
                                 _ORIGIN, n)
        got.block_until_ready()
    want = np.asarray(precision.ts_residual(b, uh, um, ul, n))
    assert np.array_equal(_own(got, S), want)


def test_prolong_pair_ext_is_eps2_exact(rng):
    """p_hi + p_lo == P ec_hi + P ec_lo to ~eps^2 (the err term itself
    rounds once — same bound as precision.prolong_comp; a plain f32
    prolongation would err at eps ~ 1e-8 relative)."""
    nc, Sc = 126, 128
    nf, Sf = 252, 256
    ec_hi = _rand_grid(nc, Sc, rng)
    ec_lo = _rand_grid(nc, Sc, rng, scale=1e-8)
    with pltpu.force_tpu_interpret_mode():
        p_hi, p_lo = KR.prolong_pair_ext(_embed_ext(ec_hi),
                                         _embed_ext(ec_lo), _ORIGIN, nf)
        p_hi.block_until_ready()
    want = np.asarray(ops.prolong(ec_hi.astype(jnp.float64), nc, Sf)
                      + ops.prolong(ec_lo.astype(jnp.float64), nc, Sf))
    got = (_own(p_hi, Sf).astype(np.float64)
           + _own(p_lo, Sf).astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-13)
    # and the hi part alone matches the plain prolongation to f32 eps
    # (absolute bound: at 4-term cancellation points the RELATIVE error
    # of hi can be large — that is exactly what the err part captures)
    np.testing.assert_allclose(
        _own(p_hi, Sf), np.asarray(ops.prolong(ec_hi, nc, Sf)),
        rtol=0, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("ts,ds_levels", [(False, 0), (True, 2)])
def test_refined_pallas_matches_jnp_tier(ts, ds_levels):
    """The fused-tier refined solve tracks the jnp-tier refined solve
    (same compensated outer iteration; inner cycles differ only in
    f32 evaluation order)."""
    cfg = MultigridConfig(finest_level=9, coarsest_level=4,
                          dtype=jnp.float32, use_pallas=True)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    with pltpu.force_tpu_interpret_mode():
        res, levels = refined_sharded_solve_pallas(
            cfg, mesh, num_cycles=3, ts=ts, ds_levels=ds_levels,
            replicate_below=128)
    assert levels.num_sharded >= 1
    h = np.asarray(res.res_history)
    assert np.isfinite(h).all()
    jres, _ = refined_sharded_solve(cfg, mesh, num_cycles=3, ts=ts,
                                    ds_levels=ds_levels, replicate_below=8)
    jh = np.asarray(jres.res_history)
    # same convergence trajectory to f32 roundoff-level differences
    np.testing.assert_allclose(h[1:] / h[0], jh[1:] / jh[0], rtol=2e-2)
    n = 2 ** 9
    np.testing.assert_allclose(np.asarray(res.u)[: n + 1, : n + 1],
                               np.asarray(jres.u)[: n + 1, : n + 1],
                               rtol=1e-4, atol=1e-8)


@pytest.mark.slow
def test_refined_pallas_single_device_mesh():
    """(1,1) mesh: the on-chip 16385^2 configuration's code path, at toy
    size — converges through the fused kernels + compensated residual."""
    cfg = MultigridConfig(finest_level=9, coarsest_level=4,
                          dtype=jnp.float32, use_pallas=True)
    mesh = make_grid_mesh(shape=(1, 1), devices=jax.devices()[:1])
    with pltpu.force_tpu_interpret_mode():
        res, levels = refined_sharded_solve_pallas(
            cfg, mesh, num_cycles=3, replicate_below=128)
    h = np.asarray(res.res_history)
    assert np.isfinite(h).all()
    assert h[3] < 5e-3 * h[0], h


@pytest.mark.parametrize("k,m", [(2, 1), (2, 2), (3, 1), (3, 2)])
def test_comp_add_ext_matches_jnp(rng, k, m):
    """Donated streamed add == the jnp ds/ts_add chain, bitwise."""
    S = 64
    R, C = S + 2 * GR, S + 2 * GC
    comps = tuple(
        jnp.asarray(rng.standard_normal((R, C)) * 10.0 ** (-7 * i),
                    jnp.float32) for i in range(k))
    ys = tuple(jnp.asarray(rng.standard_normal((R, C)), jnp.float32)
               for _ in range(m))
    with pltpu.force_tpu_interpret_mode():
        got = KR.comp_add_ext(comps, ys)
        jax.block_until_ready(got)
    add = precision.ds_add if k == 2 else precision.ts_add
    want = comps
    for y in ys:
        want = add(*want, y)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_divisor_strip():
    from tpu_multigrid.kernels.localref import _divisor_strip
    for R in (96, 17440, 544, 1090 * 16):
        t = _divisor_strip(R, 256)
        assert t % 8 == 0 and R % t == 0 and t <= 256


@pytest.mark.slow
def test_refined_pallas_prebuilt_runner_matches_default():
    """prebuilt= reuses a build_pallas_poisson result; return_runner=
    yields one jitted program whose repeated calls match the default
    path bitwise (the clean-slope timing methodology, r5)."""
    import dataclasses
    from tpu_multigrid.dist.pallas_cycle import build_pallas_poisson

    cfg = MultigridConfig(finest_level=9, coarsest_level=5,
                          dtype=jnp.float32, use_pallas=True)
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    with pltpu.force_tpu_interpret_mode():
        pre = build_pallas_poisson(dataclasses.replace(cfg, cycle="V"),
                                   mesh, replicate_below=256)
        run, b_glob, hier, levels = refined_sharded_solve_pallas(
            cfg, mesh, num_cycles=3, ts=True, ds_levels=2,
            prebuilt=pre, return_runner=True)
        _, hist, _, _ = run(b_glob, hier)
        _, hist_again, _, _ = run(b_glob, hier)    # reuse, no retrace
        res, _ = refined_sharded_solve_pallas(
            cfg, mesh, num_cycles=3, ts=True, ds_levels=2)
    h, ha, hd = (np.asarray(x) for x in (hist, hist_again,
                                         res.res_history))
    np.testing.assert_array_equal(h, ha)
    np.testing.assert_array_equal(h, hd)
    assert h[3] < 5e-3 * h[0]

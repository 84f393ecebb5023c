"""Distributed compensated refinement on the fused-Pallas tier.

The performance variant of ``dist.refine`` (VERDICT r3 next #1): the
outer ds/ts iterate lives on ghost-extended local blocks
(kernels/local.py layout), the inner correction cycle is the fused
K1/K2 distributed V-cycle (``dist.pallas_cycle._vcycle_pallas``), the
compensated residuals are one streamed launch each
(``kernels/localref.py``), and — for deep tolerances at 16385^2-scale —
ds corrections run through the finest sharded levels with the exact-pair
prolongation kernel (the distributed twin of ``precision.cycle_ds``).

This is the path that makes BASELINE config 5's convergence metric
(cycles to 1e-8 at sharded 16385^2) reachable at fused-kernel speed: the
single-chip measurements (BENCH.md r2) show plain f32 cannot even
measure progress there, and the jnp compensated expressions exhaust HBM.
On a (1, 1) mesh this runs the whole machinery on one chip — the
same code path the multi-chip virtual-mesh tests exercise.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import MultigridConfig
from ..core.grids import Hierarchy
from ..cycles import SolveResult, _coarsest_solve, _sm
from ..kernels import local as KL
from ..kernels import localref as KR
from . import local_ops as L
from .mesh import GRID_AXES
from .pallas_cycle import (_ext_origin, _halo_depths, _replicated_cycle,
                           _vcycle_pallas, build_pallas_poisson,
                           gather_owned, owned_view, refresh_ghosts,
                           scatter_owned)
from .shard_cycle import ShardedLevels

GY, GX = GRID_AXES
GR, GC = KL.GR, KL.GC


def _cycle_ds_pallas(levels: ShardedLevels, hier: Hierarchy,
                     cfg: MultigridConfig, mesh_shape: Tuple[int, int],
                     k: int, r_ext, ds_levels: int, halo: str):
    """One fused V-cycle on A e = r returning e as a ds pair of extended
    blocks (owned regions valid, ghosts stale).

    ``r_ext``'s ghosts must be fresh to K1 depth on entry.  Mirrors
    ``precision.cycle_ds``: K1 pre-smooths from zero and restricts; the
    sub-correction returns as a ds pair, prolongs through
    ``kernels.localref.prolong_pair_ext`` (exact error term), and
    post-smoothing runs in delta form against the compensated defect.
    """
    my, mx = mesh_shape
    n, S = levels.sizes[k]
    lr, lc = S // my, S // mx
    origin = _ext_origin(lr, lc)
    sm1, om1 = _sm(cfg, cfg.nu1)
    sm2, om2 = _sm(cfg, cfg.nu2)
    lean, dru, dcu, drt, dct = _halo_depths(cfg, halo)

    e0, rc = KL.smooth_restrict_ext(jnp.zeros_like(r_ext), r_ext, origin,
                                    n, cfg.nu1, sm1, om1)

    ds_limit = min(ds_levels, levels.num_sharded)
    if k + 1 < ds_limit:
        rc = refresh_ghosts(rc, n // 2, lr // 2, lc // 2, drt, dct)
        ec_hi, ec_lo = _cycle_ds_pallas(levels, hier, cfg, mesh_shape,
                                        k + 1, rc, ds_levels, halo)
    elif k + 1 < levels.num_sharded:
        rc = refresh_ghosts(rc, n // 2, lr // 2, lc // 2, drt, dct)
        ec_hi = _vcycle_pallas(levels, hier, cfg, mesh_shape, k + 1,
                               jnp.zeros_like(rc), rc, halo=halo,
                               u_ghosts_fresh=True)
        ec_lo = jnp.zeros_like(ec_hi)
    else:
        rc_full = gather_owned(rc)
        ec_full = jnp.zeros_like(rc_full)
        if k + 1 == len(levels.sizes) - 1:
            ec_full = _coarsest_solve(hier, cfg, ec_full, rc_full)
        else:
            ec_full = _replicated_cycle(hier, cfg, k + 1, ec_full, rc_full)
        ec_hi = scatter_owned(ec_full, lr // 2, lc // 2, dtype=r_ext.dtype)
        ec_lo = jnp.zeros_like(ec_hi)

    # Exact-pair prolongation needs the coarse pair fresh to (GR/2, GC/2)
    # (the K2 read contract).
    ec_hi = refresh_ghosts(ec_hi, n // 2, lr // 2, lc // 2, GR // 2, GC // 2)
    ec_lo = refresh_ghosts(ec_lo, n // 2, lr // 2, lc // 2, GR // 2, GC // 2)
    p_hi, p_lo = KR.prolong_pair_ext(ec_hi, ec_lo, origin, n)
    e_hi, e_lo = KR.comp_add_ext((p_hi, p_lo), (e0,))

    # Delta-form post-smooth against the compensated defect.  The residual
    # kernel needs 1 fresh ring on the pair (r_ext's ghosts are still
    # fresh from the caller); the post-smooth needs s2 rings on d0.
    e_hi = refresh_ghosts(e_hi, n, lr, lc, 8, 128)
    e_lo = refresh_ghosts(e_lo, n, lr, lc, 8, 128)
    d0 = KR.ds_residual_ext(r_ext, e_hi, e_lo, origin, n)
    d0 = refresh_ghosts(d0, n, lr, lc, dru, dcu)
    delta = KL.smooth_ext(jnp.zeros_like(d0), d0, origin, n, cfg.nu2,
                          sm2, om2)
    return KR.comp_add_ext((e_hi, e_lo), (delta,))


def refined_sharded_solve_pallas(config: MultigridConfig, mesh: Mesh, *,
                                 forcing=4.0, tol: Optional[float] = 1e-8,
                                 max_iters: int = 60,
                                 stall_factor: float = 0.9,
                                 num_cycles: Optional[int] = None,
                                 ds_levels: int = 0, ts: bool = False,
                                 replicate_below: int = 256,
                                 jit: bool = True, halo: str = "lean",
                                 prebuilt=None,
                                 return_runner: bool = False):
    """Distributed compensated refinement on the fused-kernel tier.

    The ``dist.refine.refined_sharded_solve`` contract (ds pair or ts
    triple outer iterate, tol/num_cycles, stall detection) with the
    fused K1/K2 inner cycle and the streamed compensated kernels.
    Returns ``(SolveResult, ShardedLevels)``; constant-coefficient
    Poisson only.

    ``prebuilt=(levels, hier)``: reuse a ``build_pallas_poisson(cfg,
    mesh, replicate_below=...)`` result across solves.  The hierarchy is
    a jit ARGUMENT, so passing device-resident arrays skips the per-call
    host rebuild and re-upload (~seconds at 8193²+) — the difference
    between solve latency and iteration cost for repeated solves.
    """
    if tol is None and num_cycles is None:
        raise ValueError("refined solve needs tol or num_cycles")
    my, mx = mesh.devices.shape
    cfg = dataclasses.replace(config, cycle="V")
    levels, hier = prebuilt if prebuilt is not None else \
        build_pallas_poisson(cfg, mesh, replicate_below=replicate_below)
    if levels.num_sharded < 1:
        raise ValueError(
            f"no level satisfies the Pallas shard constraints for mesh "
            f"{(my, mx)} at finest_level={cfg.finest_level}; use "
            f"dist.refine.refined_sharded_solve (levels: {levels.sizes})")
    n0, S0 = levels.sizes[0]
    lr, lc = S0 // my, S0 // mx
    if not KR.supported_local_ref(lr + 2 * GR, lc + 2 * GC, cfg.dtype):
        raise ValueError(
            f"local block ({lr}x{lc}) outside the compensated-kernel "
            f"envelope (f32, 16/256 quanta, cols <= 9k)")
    h2 = (1.0 / n0) ** 2
    dt = jnp.dtype(cfg.dtype)
    spec = P(*GRID_AXES)
    fixed = num_cycles is not None
    ncyc = num_cycles if fixed else max_iters
    ncomp = 3 if ts else 2
    lean, dru, dcu, _, _ = _halo_depths(cfg, halo)

    b_glob = jax.device_put(np.zeros((S0, S0), dt),
                            NamedSharding(mesh, spec))

    # The hierarchy is a shard_map ARGUMENT, not a closure: closed-over
    # arrays (the dense coarse inverse!) embed as constants in the
    # remote-compile request (CLAUDE.md: HTTP 413 / giant uploads).
    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, P()),
                       out_specs=(tuple([spec] * ncomp), P(), P(), P()),
                       check_vma=False)
    def run(b_loc, hier):
        origin = _ext_origin(lr, lc)
        # Extended RHS on owned interior, ghosts refreshed once (same as
        # pallas_cycle.sharded_solve_pallas).
        ext = jnp.zeros((lr + 2 * GR, lc + 2 * GC), dt)
        oy = lax.axis_index(GY) * lr - GR
        ox = lax.axis_index(GX) * lc - GC
        gi = lax.broadcasted_iota(jnp.int32, ext.shape, 0) + oy
        gj = lax.broadcasted_iota(jnp.int32, ext.shape, 1) + ox
        inter = (gi >= 1) & (gi <= n0 - 1) & (gj >= 1) & (gj <= n0 - 1)
        owned = ((gi >= lax.axis_index(GY) * lr)
                 & (gi < (lax.axis_index(GY) + 1) * lr)
                 & (gj >= lax.axis_index(GX) * lc)
                 & (gj < (lax.axis_index(GX) + 1) * lc))
        if callable(forcing):
            h = 1.0 / n0
            x = gj.astype(dt) * jnp.asarray(h, dt)
            y = gi.astype(dt) * jnp.asarray(h, dt)
            vals = forcing(x, y).astype(dt) * jnp.asarray(h2, dt)
        else:
            vals = jnp.full(ext.shape, float(forcing) * h2, dt)
        b_ext = jnp.where(inter & owned, vals, jnp.zeros((), dt))
        b_ext = refresh_ghosts(b_ext, n0, lr, lc)

        def owned_norm(r_ext):
            return L.norm2_local(owned_view(r_ext))

        def resid(comps):
            # comps' ghosts must be fresh to 1 ring (quanta 8/128).
            comps = tuple(refresh_ghosts(c, n0, lr, lc, 8, 128)
                          for c in comps)
            if ts:
                r = KR.ts_residual_ext(b_ext, *comps, origin, n0)
            else:
                r = KR.ds_residual_ext(b_ext, *comps, origin, n0)
            return comps, r

        z = jnp.zeros_like(b_ext)
        comps = (z, z, z) if ts else (z, z)
        r = b_ext  # ghosts already fresh
        r0 = owned_norm(r)
        target = (jnp.asarray(tol, jnp.float32) * r0 if tol is not None
                  else jnp.asarray(0.0, jnp.float32))
        hist = jnp.full((ncyc + 1,), jnp.nan, jnp.float32).at[0].set(r0)

        def cond(carry):
            _, _, i, rnorm, prev, _ = carry
            keep = i < ncyc
            if not fixed:
                progressing = (rnorm < jnp.asarray(stall_factor,
                                                   jnp.float32) * prev)
                keep &= (rnorm > target) & progressing
            return keep

        def body(carry):
            comps, r, i, rnorm, _, hist = carry
            # Donated streamed adds (KR.comp_add_ext): the jnp
            # ds_add/ts_add chains materialize fresh component sets and
            # at 16385^2 extended blocks (1.25 GB/array) the ts triple
            # blew the one chip's HBM (r4 ResourceExhausted).
            if ds_levels > 0 and levels.num_sharded > 0:
                e_hi, e_lo = _cycle_ds_pallas(levels, hier, cfg, (my, mx),
                                              0, r, ds_levels, halo)
                comps = KR.comp_add_ext(comps, (e_hi, e_lo))
            else:
                e = _vcycle_pallas(levels, hier, cfg, (my, mx), 0,
                                   jnp.zeros_like(r), r, halo=halo,
                                   u_ghosts_fresh=True)
                comps = KR.comp_add_ext(comps, (e,))
            comps, r = resid(comps)
            # Next K1 launch reads r to smoothing depth.
            r = refresh_ghosts(r, n0, lr, lc, dru, dcu)
            rnew = owned_norm(r)
            hist = hist.at[i + 1].set(rnew)
            return comps, r, i + 1, rnew, rnorm, hist

        inf = jnp.asarray(jnp.inf, jnp.float32)
        comps, r, iters, rnorm, _, hist = lax.while_loop(
            cond, body,
            (comps, r, jnp.asarray(0, jnp.int32), r0, inf, hist))
        conv = jnp.asarray(True) if fixed else rnorm <= target
        return tuple(owned_view(c) for c in comps), hist, iters, conv

    if jit:
        run = jax.jit(run)
    if return_runner:
        # One traced/jitted program for reuse: runner(b_glob, hier) —
        # repeated calls skip the per-call closure retrace (5-25 s of
        # host time at 8193²+, the dominant latency for repeat solves).
        return run, b_glob, hier, levels
    comps, hist, iters, conv = run(b_glob, hier)
    return SolveResult(u=comps[0], res_history=hist, iterations=iters,
                       converged=conv), levels

"""Distributed FAS multigrid on the fused Pallas extended-block kernels.

The nonlinear twin of :mod:`dist.pallas_cycle`: each sharded FAS level
visit is ONE ghost exchange + one K1f launch (nonlinear sweeps +
residual + solution injection + in-VMEM coarse FAS RHS) downward, and
one exchange + one K2f launch (prolong + correct + nonlinear sweeps,
with the owned nonlinear residual norm fused for until-tol) upward —
versus one ppermute ring per sweep on the jnp tier (:mod:`dist.fas`).

FAS-specific plumbing vs the linear fused cycle: K1f emits TWO coarse
extended blocks (the injected solution ``uc0`` — the next level's
initial iterate — and the FAS RHS ``bc``), both ghost-refreshed before
the coarse visit; the correction is ``uc − uc0`` (owned-valid
elementwise), ghost-refreshed before K2f.  Below the replication switch
the gathered blocks run the stock single-chip FAS recursion
(``cycles.fas.fas_cycle`` over a replicated ``PointwiseNonlinearOp``
tail ending in the dense-Newton coarsest solve).

Reference: the single-queue, linear-only reference
(``Poissons_SYCL.cpp:659``) has neither distribution nor nonlinearity;
SURVEY §2.3 domain decomposition is the parallelism axis.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import MultigridConfig
from ..cycles import SolveResult
from ..cycles.fas import fas_cycle
from ..kernels import localfas as KLF
from . import local_ops as L
from .fas import _n_residual_local, build_replicated_tail
from .mesh import GRID_AXES
from .pallas_cycle import (GC, GR, _ext_origin, _extend_local, _halo_depths,
                           gather_owned, owned_view, pallas_level_sizes,
                           refresh_ghosts, scatter_owned)
from .shard_cycle import ShardedLevels

GY, GX = GRID_AXES


def _k1f(u, b, origin, n, cfg, phi, dphi, a):
    h2 = (1.0 / n) ** 2
    if a is not None:
        return KLF.qfas_smooth_restrict_ext(u, b, origin, n, cfg.nu1,
                                            float(cfg.omega), a)
    return KLF.fas_smooth_restrict_ext(u, b, origin, n, cfg.nu1,
                                       float(cfg.omega), phi, dphi, h2)


def _k2f(u, b, ec, origin, n, cfg, phi, dphi, a, want):
    h2 = (1.0 / n) ** 2
    if a is not None:
        return KLF.qfas_prolong_smooth_ext(u, b, ec, origin, n, cfg.nu2,
                                           float(cfg.omega), a,
                                           want_resnorm=want)
    return KLF.fas_prolong_smooth_ext(u, b, ec, origin, n, cfg.nu2,
                                      float(cfg.omega), phi, dphi, h2,
                                      want_resnorm=want)


def _fas_vcycle_pallas(levels: ShardedLevels, tail, cfg: MultigridConfig,
                       mesh_shape, k: int, u, b, *, phi, dphi, a=None,
                       want_norm: bool = False, halo: str = "lean",
                       u_ghosts_fresh: bool = False):
    """FAS V/W/F-cycle at sharded level k on extended blocks (in
    shard_map).  ``b``'s ghosts must be valid on entry; returns u'
    (owned valid), plus the global nonlinear residual norm when
    ``want_norm``."""
    my, mx = mesh_shape
    n, S = levels.sizes[k]
    lr, lc = S // my, S // mx
    origin = _ext_origin(lr, lc)
    lean, dru, dcu, drt, dct = _halo_depths(cfg, halo)

    if not u_ghosts_fresh:
        u = refresh_ghosts(u, n, lr, lc, dru, dcu)
    u, uc0, bc = _k1f(u, b, origin, n, cfg, phi, dphi, a)

    recurse_cnt = 2 if cfg.cycle in ("W", "F") else 1
    nc = n // 2
    if k + 1 < levels.num_sharded:
        # uc0 is the next level's initial ITERATE (its pre-smooth reads
        # full u-depth ghosts) and bc its RHS.
        uc0 = refresh_ghosts(uc0, nc, lr // 2, lc // 2, dru, dcu)
        bc = refresh_ghosts(bc, nc, lr // 2, lc // 2, drt, dct)
        uc = uc0
        for i in range(recurse_cnt):
            sub = cfg if (cfg.cycle != "F" or i == 0) else \
                dataclasses.replace(cfg, cycle="V")
            uc = _fas_vcycle_pallas(levels, tail, sub, mesh_shape, k + 1,
                                    uc, bc, phi=phi, dphi=dphi, a=a,
                                    halo=halo, u_ghosts_fresh=(i == 0))
        ec = uc - uc0          # owned valid; ghosts refreshed below
    else:
        uc0_full = gather_owned(uc0)
        bc_full = gather_owned(bc)
        uc_full = uc0_full
        for i in range(recurse_cnt):
            sub = cfg if (cfg.cycle != "F" or i == 0) else \
                dataclasses.replace(cfg, cycle="V")
            uc_full = fas_cycle(tail, sub, uc_full, bc_full, k=k + 1)
        ec = scatter_owned(uc_full - uc0_full, lr // 2, lc // 2,
                           dtype=u.dtype)

    ec = refresh_ghosts(ec, nc, lr // 2, lc // 2,
                        GR // 2 if lean else GR, GC // 2 if lean else GC)
    if not lean:
        u = refresh_ghosts(u, n, lr, lc)
    if want_norm:
        u, ss = _k2f(u, b, ec, origin, n, cfg, phi, dphi, a, True)
        ss = lax.psum(lax.psum(ss, GY), GX)
        return u, jnp.sqrt(ss).astype(jnp.float32)
    return _k2f(u, b, ec, origin, n, cfg, phi, dphi, a, False)


def _nl_residual_owned(u_ext, b_ext, phi, a, n, h2):
    """Owned-view nonlinear residual (one jnp halo ring) for the driver's
    r0 / history — the per-cycle norm itself rides K2f."""
    uo, bo = owned_view(u_ext), owned_view(b_ext)
    if a is None:
        return _n_residual_local(uo, bo, phi, n, h2)
    # quasilinear: local edge fluxes with one ppermute halo ring (wrapped
    # mesh-edge ghost garbage only ever feeds masked boundary cells).
    m = L.interior_mask_local(uo.shape, n)
    half = jnp.asarray(0.5, uo.dtype)
    hx = L.with_halo1(uo)
    flux = jnp.zeros_like(uo)
    for un in (hx[1:-1, 2:], hx[1:-1, :-2], hx[2:, 1:-1], hx[:-2, 1:-1]):
        ae = a(half * (uo + un)).astype(uo.dtype)
        flux = flux + ae * (uo - un)
    return jnp.where(m, bo - jnp.where(m, flux, jnp.zeros((), uo.dtype)),
                     jnp.zeros((), uo.dtype))


def fas_sharded_solve_pallas(config: MultigridConfig, mesh: Mesh, *,
                             phi: Optional[Callable] = None,
                             dphi: Optional[Callable] = None,
                             a: Optional[Callable] = None,
                             forcing=4.0, tol: Optional[float] = 1e-8,
                             max_cycles: int = 100,
                             num_cycles: Optional[int] = None, u0=None,
                             replicate_below: int = 256, jit: bool = True,
                             halo: str = "lean"):
    """Distributed FAS solve on the fused extended-block kernels.

    Pointwise family: pass ``phi``/``dphi`` (−Δu + φ(u) = f).
    Quasilinear family: pass ``a`` (−∇·(a(u)∇u) = f; Picard-Jacobi).
    Returns ``(SolveResult, ShardedLevels)``.
    """
    if (a is None) == (phi is None):
        raise ValueError("pass exactly one of phi/dphi (pointwise) or a "
                         "(quasilinear)")
    if tol is None and num_cycles is None:
        raise ValueError("need tol or num_cycles")
    my, mx = mesh.devices.shape
    levels = pallas_level_sizes(config, (my, mx),
                                replicate_below=replicate_below)
    if levels.num_sharded < 1:
        raise ValueError(
            f"no level satisfies the Pallas shard constraints for mesh "
            f"{(my, mx)} at finest_level={config.finest_level}; use "
            f"dist.fas.fas_sharded_solve instead (levels: {levels.sizes})")
    if a is not None:
        from ..core.nonlinear import QuasilinearFluxOp
        from ..core.grids import Hierarchy
        tail = Hierarchy(tuple(QuasilinearFluxOp(n, S, a, a)
                               for (n, S) in levels.sizes), None)
    else:
        tail = build_replicated_tail(levels, config, phi, dphi)
    tail = jax.device_put(tail)
    n0, S0 = levels.sizes[0]
    lr, lc = S0 // my, S0 // mx
    h2 = (1.0 / n0) ** 2
    dt = jnp.dtype(config.dtype)
    spec = P(*GRID_AXES)
    gspec = NamedSharding(mesh, spec)
    fixed = num_cycles is not None
    ncyc = num_cycles if fixed else max_cycles

    u0_glob = jax.device_put(
        np.zeros((S0, S0), dt) if u0 is None else np.asarray(u0, dt), gspec)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, P()),
                       out_specs=(spec, P(), P(), P()), check_vma=False)
    def run(u0_loc, tail_loc):
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

        u = _extend_local(u0_loc, n0, lr, lc)
        r0 = L.norm2_local(_nl_residual_owned(u, b_ext, phi, a, n0, h2))
        target = (jnp.asarray(tol, jnp.float32) * r0 if tol is not None
                  else jnp.asarray(0.0, jnp.float32))
        hist = jnp.full((ncyc + 1,), jnp.nan, jnp.float32).at[0].set(r0)

        def cond(carry):
            _, i, rnorm, stalls, _ = carry
            keep = i < ncyc
            if not fixed:
                keep &= (rnorm > target) & (stalls < 2)
            return keep

        def body(carry):
            u, i, rnorm, stalls, hist = carry
            u, rnew = _fas_vcycle_pallas(levels, tail_loc, config,
                                         (my, mx), 0, u, b_ext, phi=phi,
                                         dphi=dphi, a=a, want_norm=True,
                                         halo=halo)
            hist = hist.at[i + 1].set(rnew)
            stalls = jnp.where(rnew > 0.9 * rnorm, stalls + 1,
                               jnp.zeros_like(stalls))
            return u, i + 1, rnew, stalls, hist

        u, iters, rnorm, _, hist = lax.while_loop(
            cond, body, (u, jnp.asarray(0, jnp.int32), r0,
                         jnp.asarray(0, jnp.int32), hist))
        return owned_view(u), hist, iters, rnorm <= target

    if jit:
        run = jax.jit(run)
    u, hist, iters, conv = run(u0_glob, tail)
    return SolveResult(u=u, res_history=hist, iterations=iters,
                       converged=conv), levels

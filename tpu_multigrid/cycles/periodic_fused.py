"""Fused Pallas V-cycles on the periodic torus (wrap-aware seams).

VERDICT r4 next #8: the periodic family was the last jnp-only 2D family
with a fused-tier delta (11.67 ms vs ~7 ms interior at 4097²).  The wrap
rows land exactly where the DIST tier already puts its halos, so instead
of new kernels this path reuses the ghost-extended block kernels
(``kernels/local.py`` K1/K2) with:

* state held EXTENDED for the whole solve: ``(n + 2·GR, n + 2·GC)``
  arrays whose ghost rings are wrap copies (``jnp.pad(..., "wrap")``) —
  the torus topology IS the dist tier's halo exchange, with ``jnp.roll``
  semantics replaced by 4 cheap strip copies per level visit;
* the "virtual interior" trick: the local kernels mask Dirichlet
  interiors in global coordinates, so passing ``origin = (2, 2)`` and a
  huge virtual ``n`` makes every mask true — every cell of the extended
  block (ghosts included) smooths as a live unknown, and validity
  shrinks into the ghost ring exactly as in the dist tier.  No kernel
  changes, no new masks, no stored index arrays.

K1's coarse output block is precisely the next level's extended block
(``(R//2+GR, C//2+GC)`` = ``(n/2+2·GR, n/2+2·GC)``), so the fused
recursion composes; levels below the kernel quanta (n % 256 or < 256)
fall back to the jnp ``PeriodicOp`` protocol path, and the coarsest uses
the dense pseudo-inverse (mean-zero gauge) as always.

Mean-zero invariance: the kernels run plain weighted-Jacobi/RBGS sweeps
(row sums zero on the torus) and variational transfers, so the mean-zero
subspace is preserved exactly as in the jnp path — no re-projection.

Reference: boundary-handling generality (``Poissons_SYCL.cpp:188-198``,
Dirichlet-only) — this family and tier are framework extensions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import MultigridConfig
from ..core import ops
from ..core.grids import Hierarchy

# Any even virtual n large enough that every global coordinate the
# kernels can compute stays in [1, n-1]: with origin (2, 2) the masks
# are all-true over the whole extended block.
_VIRT_N = 1 << 30
_ORG = ((2, 2),)


def _org():
    return jnp.asarray(_ORG, jnp.int32)


def _gr_gc():
    from ..kernels.local import GC, GR
    return GR, GC


def fused_levels(hier: Hierarchy, cfg: MultigridConfig, dtype) -> int:
    """Number of leading levels whose visits run the fused ext kernels.

    A level qualifies when its extended block passes
    ``kernels.local.supported_local`` (n mult 256, f32, ghost depth
    covers the smoothing shrink) and it is not the coarsest (the
    pseudo-inverse solve stays jnp).
    """
    if not cfg.use_pallas:
        return 0
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return 0
    if cfg.effective_smooth_dtype != dtype:
        return 0
    if cfg.smoother not in ("jacobi", "rbgs", "chebyshev"):
        return 0
    from ..kernels.local import supported_local
    GR, GC = _gr_gc()
    mult = 2 if cfg.smoother == "rbgs" else 1
    steps = mult * max(cfg.nu1, cfg.nu2, 1) + 1   # +1 K2 resnorm ring
    depth = 0
    for k in range(hier.num_levels - 1):
        n = hier.levels[k].n
        if n % 2 or not supported_local(n + 2 * GR, n + 2 * GC, steps,
                                        dtype):
            break
        depth += 1
    return depth


def extend(x):
    """(n, n) torus grid -> wrap-extended (n + 2·GR, n + 2·GC) block."""
    GR, GC = _gr_gc()
    return jnp.pad(x, ((GR, GR), (GC, GC)), mode="wrap")


def owned(xe):
    GR, GC = _gr_gc()
    R, C = xe.shape
    return xe[GR:R - GR, GC:C - GC]


def refresh(xe):
    """Re-copy the wrap ghost rings from the owned region (rows first,
    then columns over the refreshed rows, so corners come out right)."""
    GR, GC = _gr_gc()
    R, C = xe.shape
    lr, lc = R - 2 * GR, C - 2 * GC
    xe = xe.at[:GR].set(jax.lax.dynamic_slice_in_dim(xe, lr, GR, 0))
    xe = xe.at[R - GR:].set(jax.lax.dynamic_slice_in_dim(xe, GR, GR, 0))
    xe = xe.at[:, :GC].set(jax.lax.dynamic_slice_in_dim(xe, lc, GC, 1))
    xe = xe.at[:, C - GC:].set(jax.lax.dynamic_slice_in_dim(xe, GC, GC, 1))
    return xe


def _cycle_ext(hier, cfg: MultigridConfig, ue, be, k: int, depth: int,
               resnorm: bool = False):
    """One cycle visit at fused level k; ue/be are extended blocks with
    valid ghosts.  Returns u'ext (ghosts stale) and, when ``resnorm``,
    the owned post-smooth residual norm."""
    from . import _sm, _vcycle_only, cycle
    from ..kernels.local import prolong_smooth_ext, smooth_restrict_ext

    sm1, om1 = _sm(cfg, cfg.nu1)
    sm2, om2 = _sm(cfg, cfg.nu2)
    ue, rce = smooth_restrict_ext(ue, be, _org(), _VIRT_N, cfg.nu1, sm1,
                                  om1)
    rce = refresh(rce)
    if k + 1 < depth:
        ece = jnp.zeros_like(rce)
        ece = _cycle_ext(hier, cfg, ece, rce, k + 1, depth)
        if cfg.cycle in ("W", "F"):
            ece = refresh(ece)
            sub = cfg if cfg.cycle == "W" else dataclasses.replace(
                cfg, cycle="V")
            ece = _cycle_ext(hier, sub, ece, rce, k + 1, depth)
    else:
        rc = owned(rce)
        ec = jnp.zeros_like(rc)
        ec = cycle(hier, cfg, ec, rc, k + 1)
        if cfg.cycle == "W":
            ec = cycle(hier, cfg, ec, rc, k + 1)
        elif cfg.cycle == "F":
            ec = _vcycle_only(hier, cfg, ec, rc, k + 1)
        ece = extend(ec)
    ece = refresh(ece)
    out = prolong_smooth_ext(ue, be, ece, _org(), _VIRT_N, cfg.nu2, sm2,
                             om2, want_resnorm=resnorm)
    if resnorm:
        un, ss = out
        return un, jnp.sqrt(ss)
    return out


def cycle_with_norm_ext(hier, cfg: MultigridConfig, ue, be, depth: int):
    """One finest-level fused cycle + the post-cycle residual norm (fused
    into K2 — zero extra HBM traffic).  Ghosts of the returned iterate
    are refreshed, ready for the next cycle."""
    ue, rnorm = _cycle_ext(hier, cfg, ue, be, 0, depth, resnorm=True)
    return refresh(ue), rnorm


def solve_fixed_periodic(hier: Hierarchy, cfg: MultigridConfig, b,
                         num_cycles: int, u0=None):
    """Fused-periodic twin of ``cycles.solve_fixed`` (extended state kept
    across cycles; embedding cost paid once per solve)."""
    from . import SolveResult
    op = hier.levels[0]
    depth = fused_levels(hier, cfg, b.dtype)
    u = u0 if u0 is not None else jnp.zeros(op.grid_shape, b.dtype)
    ue, be = extend(u), extend(b)
    hist = jnp.full((num_cycles + 1,), jnp.nan, jnp.float32)
    hist = hist.at[0].set(ops.norm2(op.residual(u, b)))

    def body(i, carry):
        ue, hist = carry
        ue, rnorm = cycle_with_norm_ext(hier, cfg, ue, be, depth)
        return ue, hist.at[i + 1].set(rnorm)

    ue, hist = jax.lax.fori_loop(0, num_cycles, body, (ue, hist))
    return SolveResult(u=owned(ue), res_history=hist,
                       iterations=jnp.asarray(num_cycles, jnp.int32),
                       converged=jnp.asarray(True))


def solve_until_tol_periodic(hier: Hierarchy, cfg: MultigridConfig, b, *,
                             tol: float, max_cycles: int = 100,
                             relative: bool = True, u0=None,
                             stall_factor: float = 0.9):
    """Fused-periodic twin of ``cycles.solve_until_tol`` (same stall
    rule: two consecutive non-progressing cycles end the solve)."""
    from . import SolveResult
    op = hier.levels[0]
    depth = fused_levels(hier, cfg, b.dtype)
    u = u0 if u0 is not None else jnp.zeros(op.grid_shape, b.dtype)
    ue, be = extend(u), extend(b)
    r0 = ops.norm2(op.residual(u, b))
    target = tol * r0 if relative else jnp.asarray(tol, jnp.float32)
    target = jnp.maximum(target, jnp.asarray(0.0, jnp.float32))
    hist = jnp.full((max_cycles + 1,), jnp.nan, jnp.float32)
    hist = hist.at[0].set(r0)
    sf = jnp.asarray(stall_factor, jnp.float32)

    def cond(carry):
        _, i, rnorm, stalls, _ = carry
        return (i < max_cycles) & (rnorm > target) & (stalls < 2)

    def body(carry):
        ue, i, rnorm, stalls, hist = carry
        ue, rnew = cycle_with_norm_ext(hier, cfg, ue, be, depth)
        hist = hist.at[i + 1].set(rnew)
        stalls = jnp.where(rnew > sf * rnorm, stalls + 1,
                           jnp.zeros_like(stalls))
        return ue, i + 1, rnew, stalls, hist

    ue, iters, rnorm, _, hist = jax.lax.while_loop(
        cond, body, (ue, jnp.asarray(0, jnp.int32), r0,
                     jnp.asarray(0, jnp.int32), hist))
    return SolveResult(u=owned(ue), res_history=hist, iterations=iters,
                       converged=rnorm <= target)

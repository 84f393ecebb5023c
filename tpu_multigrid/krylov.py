"""Multigrid-preconditioned conjugate gradients.

Beyond the reference's capabilities (it has no Krylov layer): in production
elliptic solvers, one V-cycle per iteration is the standard preconditioner —
CG turns multigrid's ~0.13 error-reduction factor into a guaranteed-descent
method that is robust when the cycle degrades (strong coefficient jumps,
imperfect coarse operators).

The preconditioner application M^{-1} r = one cycle on A e = r from a zero
initial guess, which is a fixed SPD linear operator for symmetric smoothing
schedules (nu1 == nu2 with the same smoother) — the standard requirement for
PCG convergence theory.

Everything runs in one jit: the CG loop is a ``lax.while_loop`` whose body
contains the full multigrid cycle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import MultigridConfig
from .core import ops
from .core.grids import Hierarchy
from .cycles import SolveResult, cycle


def _dot(a, b):
    x = a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a
    y = b.astype(jnp.float32) if b.dtype == jnp.bfloat16 else b
    return jnp.sum(x * y)


def pcg_solve(hier: Hierarchy, cfg: MultigridConfig, b, *, tol: float = 1e-6,
              max_iters: int = 100, u0=None) -> SolveResult:
    """Preconditioned CG with one multigrid cycle as M^{-1}.

    Returns a :class:`SolveResult` (res_history = ||r||_2 per iteration).
    For an SPD preconditioner use a symmetric schedule (nu1 == nu2).
    """
    op = hier.levels[0]
    u = u0 if u0 is not None else jnp.zeros(
        getattr(op, "grid_shape", (op.S, op.S)), b.dtype)

    def precond(r):
        e0 = jnp.zeros_like(r)
        return cycle(hier, cfg, e0, r)

    r = op.residual(u, b)
    z = precond(r)
    p = z
    rz = _dot(r, z)
    r0 = ops.norm2(r)
    target = jnp.asarray(tol, jnp.float32) * r0
    hist = jnp.full((max_iters + 1,), jnp.nan, jnp.float32).at[0].set(r0)

    def cond(carry):
        _, _, _, _, rnorm, i, _ = carry
        return (i < max_iters) & (rnorm > target)

    def body(carry):
        u, r, p, rz, _, i, hist = carry
        ap = op.apply(p)
        # finfo.tiny, not a literal: 1e-300 underflows to 0 in f32 and the
        # guard would be a no-op at exact convergence (p.Ap == 0).
        tiny = jnp.asarray(jnp.finfo(rz.dtype).tiny, rz.dtype)
        alpha = rz / jnp.maximum(_dot(p, ap), tiny)
        u = (u + alpha.astype(u.dtype) * p).astype(u.dtype)
        r = (r - alpha.astype(r.dtype) * ap).astype(r.dtype)
        z = precond(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.maximum(rz, tiny)
        p = (z + beta.astype(p.dtype) * p).astype(p.dtype)
        rnorm = ops.norm2(r)
        hist = hist.at[i + 1].set(rnorm)
        return u, r, p, rz_new, rnorm, i + 1, hist

    u, r, p, rz, rnorm, iters, hist = jax.lax.while_loop(
        cond, body, (u, r, p, rz, r0, jnp.asarray(0, jnp.int32), hist))
    return SolveResult(u=u, res_history=hist, iterations=iters,
                       converged=rnorm <= target)


def bicgstab_solve(hier: Hierarchy, cfg: MultigridConfig, b, *,
                   tol: float = 1e-6, max_iters: int = 100,
                   u0=None) -> SolveResult:
    """Multigrid-preconditioned BiCGStab for NONSYMMETRIC operators.

    CG's convergence theory needs an SPD pair (A, M); the upwind
    convection-diffusion operators (problems/convection.py) are
    nonsymmetric, where BiCGStab is the standard short-recurrence Krylov
    wrapper.  Right-preconditioned: each iteration applies one multigrid
    cycle twice (on p and on s).  Textbook van der Vorst formulation;
    ``omega``/``rho`` breakdowns are guarded with ``finfo.tiny`` (at
    exact convergence the loop has already exited on the residual test).
    """
    op = hier.levels[0]
    u = u0 if u0 is not None else jnp.zeros(
        getattr(op, "grid_shape", (op.S, op.S)), b.dtype)

    def precond(r):
        return cycle(hier, cfg, jnp.zeros_like(r), r)

    r = op.residual(u, b)
    r_hat = r                                  # shadow residual r~0 = r0
    rho = _dot(r_hat, r)
    p = r
    r0 = ops.norm2(r)
    target = jnp.asarray(tol, jnp.float32) * r0
    hist = jnp.full((max_iters + 1,), jnp.nan, jnp.float32).at[0].set(r0)

    def cond(carry):
        _, _, _, _, rnorm, i, _ = carry
        return (i < max_iters) & (rnorm > target)

    def _safe(d):
        # Sign-preserving breakdown guard: BiCGStab's rho and r_hat.v are
        # SIGNED (unlike CG's p.Ap), so clamping with maximum() would turn
        # every negative denominator into +tiny and blow the iterate up;
        # near-zero values clamp to +-tiny keeping their sign (0 -> +tiny).
        tiny = jnp.asarray(jnp.finfo(d.dtype).tiny, d.dtype)
        clamp = jnp.where(d < 0, -tiny, tiny)
        return jnp.where(jnp.abs(d) > tiny, d, clamp)

    def body(carry):
        u, r, p, rho, _, i, hist = carry
        ph = precond(p)
        v = op.apply(ph)
        alpha = rho / _safe(_dot(r_hat, v))
        s = (r - alpha.astype(r.dtype) * v).astype(r.dtype)
        sh = precond(s)
        t = op.apply(sh)
        omega = _dot(t, s) / _safe(_dot(t, t))
        u = (u + alpha.astype(u.dtype) * ph
             + omega.astype(u.dtype) * sh).astype(u.dtype)
        r = (s - omega.astype(s.dtype) * t).astype(s.dtype)
        rho_new = _dot(r_hat, r)
        beta = (rho_new / _safe(rho)) * (alpha / _safe(omega))
        p = (r + beta.astype(p.dtype)
             * (p - omega.astype(p.dtype) * v)).astype(p.dtype)
        rnorm = ops.norm2(r)
        hist = hist.at[i + 1].set(rnorm)
        return u, r, p, rho_new, rnorm, i + 1, hist

    u, r, p, rho, rnorm, iters, hist = jax.lax.while_loop(
        cond, body, (u, r, p, rho, r0, jnp.asarray(0, jnp.int32), hist))
    return SolveResult(u=u, res_history=hist, iterations=iters,
                       converged=rnorm <= target)

"""Shard-local 3D variable-coefficient (7-point flux) operators.

Distributed tier for :class:`core.operators.VarStencilOp3D` (completes
the distribution matrix: 2D const/var and 3D const were distributed, 3D
var was single-chip only).  The transmissibility planes ``tz/ty/tx`` and
``inv_diag`` are domain-decomposed (gz, gy) alongside u/b, x shard-local
— the same layout as ``dist.local_ops3``.  The negative-direction
couplings read the NEIGHBOR's transmissibility (``t`` at z-1 / y-1), so
the static planes are halo-extended with one ppermute per application —
unlike u, which exchanges per sweep.  Wrap-around ghosts land on
global-boundary/padding nodes that the interior masks zero (the
invariant of ``core.ops3d``).

All functions run *inside* ``shard_map`` with mesh axes ``("gz", "gy")``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from . import local_ops3 as L3


def _t_minus(tz, ty):
    """Neighbor-owned transmissibilities at z-1 / y-1 (one ppermute each;
    computed once per application and shared between the off-diagonal sum
    and the diagonal recompute)."""
    return L3._extend_z(tz)[:-2], L3._extend_y(ty)[:, :-2]


def var3_off_diag_local(u, tz, ty, tx, tm=None):
    """Positive neighbor sum ``sum t * u_nbr`` on local blocks.

    Mirrors ``VarStencilOp3D._off_diag_apply`` with the z/y rolls
    replaced by ghost exchanges (u: both sides; t: low side only — the
    +direction coupling uses the locally owned plane).
    """
    hz = L3._extend_z(u)
    hy = L3._extend_y(u)
    u_zp, u_zm = hz[2:], hz[:-2]
    u_yp, u_ym = hy[:, 2:], hy[:, :-2]
    tz_m, ty_m = tm if tm is not None else _t_minus(tz, ty)
    tx_m = jnp.roll(tx, 1, -1)            # x is shard-local
    acc = (tx * jnp.roll(u, -1, -1) + tx_m * jnp.roll(u, 1, -1)
           + ty * u_yp + ty_m * u_ym
           + tz * u_zp + tz_m * u_zm)
    return acc.astype(u.dtype)


def var3_apply_local(u, tz, ty, tx, inv_diag, n):
    """A u on local blocks.

    ``inv_diag`` is accepted for the uniform (tz, ty, tx, inv_diag)
    plane-tuple calling convention (the smoothers use it); the diagonal
    is recomputed from the t planes exactly as ``VarStencilOp3D._diag``
    does, sharing the ghost-extended t arrays with the off-diagonal sum.
    """
    tm = _t_minus(tz, ty)
    tz_m, ty_m = tm
    d = (tx + jnp.roll(tx, 1, -1) + ty + ty_m + tz + tz_m).astype(u.dtype)
    out = d * u - var3_off_diag_local(u, tz, ty, tx, tm=tm)
    m = L3.interior_mask_local3(u.shape, n)
    return jnp.where(m, out, jnp.zeros((), u.dtype)).astype(u.dtype)


def var3_residual_local(u, b, tz, ty, tx, inv_diag, n):
    r = b - var3_apply_local(u, tz, ty, tx, inv_diag, n)
    m = L3.interior_mask_local3(u.shape, n)
    return jnp.where(m, r, jnp.zeros((), u.dtype)).astype(u.dtype)


def var3_jacobi_local(u, b, tz, ty, tx, inv_diag, n, omega, sweeps):
    """Weighted Jacobi; matches ``VarStencilOp3D.smooth`` exactly so
    1-vs-N parity holds bitwise on CPU.  ``omega`` float or per-sweep
    tuple (Chebyshev schedule)."""
    if sweeps <= 0:
        return u
    m = L3.interior_mask_local3(u.shape, n)
    inv_d = inv_diag.astype(u.dtype)
    tm = _t_minus(tz, ty)  # static planes: one exchange for all sweeps

    ws = omega if isinstance(omega, tuple) else (omega,) * sweeps
    if len(ws) < sweeps:
        ws = tuple(ws[i % len(ws)] for i in range(sweeps))
    v = u
    for w in ws[:sweeps]:
        vn = (jnp.asarray(1.0 - w, u.dtype) * v
              + jnp.asarray(w, u.dtype) * inv_d
              * (b + var3_off_diag_local(v, tz, ty, tx, tm=tm)))
        v = jnp.where(m, vn, jnp.zeros((), u.dtype))
    return v


def var3_rbgs_local(u, b, tz, ty, tx, inv_diag, n, sweeps):
    if sweeps <= 0:
        return u
    z0, y0 = L3._local_offsets3(u.shape)
    gz = lax.broadcasted_iota(jnp.int32, u.shape, 0) + z0
    gy = lax.broadcasted_iota(jnp.int32, u.shape, 1) + y0
    gx = lax.broadcasted_iota(jnp.int32, u.shape, 2)
    inter = L3.interior_mask_local3(u.shape, n)
    par = (gz + gy + gx) % 2
    inv_d = inv_diag.astype(u.dtype)
    tm = _t_minus(tz, ty)  # static planes: one exchange for all sweeps

    def half(v, color):
        vn = inv_d * (b + var3_off_diag_local(v, tz, ty, tx, tm=tm))
        return jnp.where(inter & color, vn.astype(v.dtype), v)

    v = u
    for _ in range(sweeps):
        v = half(v, par == 0)
        v = half(v, par == 1)
    return v

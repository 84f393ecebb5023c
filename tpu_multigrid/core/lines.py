"""Line (zebra) relaxation via parallel cyclic reduction.

Anisotropic operators (-a u_xx - c u_yy with a != c) defeat point
smoothers: error components smooth only along the strongly coupled axis,
and the pointwise smoothing factor tends to 1 as the anisotropy grows.
The textbook robust remedy on a fully coarsened hierarchy is **line
relaxation along the strong axis** — each line solves its tridiagonal
system exactly, with the weak-coupling (and 9-point diagonal) terms moved
to the RHS.  Zebra ordering (all odd lines, then all even lines) gives the
Gauss-Seidel-quality smoothing factor while keeping every line solve
independent — ideal for the VPU.

The tridiagonal solves use **parallel cyclic reduction** (PCR): log2(S)
sweeps of full-array shifts/FMAs, no sequential scan — unlike the Thomas
algorithm, which would serialize 4096+ steps on the lane dimension.  All
shapes static; out-of-range shifts substitute the identity row (d=1,
off=0, b=0), so padding and Dirichlet exterior solve to zero.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def tridiag_pcr(dl, d, du, b):
    """Solve T x = b along the LAST axis, batched over leading axes.

    ``dl[j]`` multiplies x[j-1], ``d[j]`` x[j], ``du[j]`` x[j+1].  Rows
    outside the system of interest must be pre-set to the identity
    (d=1, dl=du=0, b=0).  Requires T (after that embedding) to be
    invertible; exact for any well-posed tridiagonal system in the
    working precision (PCR is a direct method).
    """
    S = b.shape[-1]
    steps = max(1, math.ceil(math.log2(S)))

    def shift(x, s, fill):
        # x[j + s] with `fill` outside [0, S)
        rolled = jnp.roll(x, -s, axis=-1)
        j = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        ok = (j + s >= 0) & (j + s < S)
        return jnp.where(ok, rolled, jnp.asarray(fill, x.dtype))

    for k in range(steps):
        s = 1 << k
        d_m, d_p = shift(d, -s, 1.0), shift(d, s, 1.0)
        dl_m, du_p = shift(dl, -s, 0.0), shift(du, s, 0.0)
        du_m, dl_p = shift(du, -s, 0.0), shift(dl, s, 0.0)
        b_m, b_p = shift(b, -s, 0.0), shift(b, s, 0.0)
        alpha = -dl / d_m
        beta = -du / d_p
        d = d + alpha * du_m + beta * dl_p
        b = b + alpha * b_m + beta * b_p
        dl = alpha * dl_m
        du = beta * du_p
    return b / d


def _line_system(coef, b_eff, u, axis, box, dtype):
    """Tridiagonal pieces for lines running along ``axis`` (1 = rows/x)."""
    shape = u.shape[-2:]  # rectangular grids OK (core.semicoarsen.SemiOp)
    i0, i1, j0, j1 = box
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    inter = (i >= i0) & (i <= i1) & (j >= j0) & (j <= j1)
    if axis == 1:
        dl, du = coef[1, 0], coef[1, 2]
    else:
        dl, du = coef[0, 1], coef[2, 1]
    d = coef[1, 1]
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    d = jnp.where(inter, d, one)
    dl = jnp.where(inter, dl, zero)
    du = jnp.where(inter, du, zero)
    b_eff = jnp.where(inter, b_eff, zero)
    return dl, d, du, b_eff, inter


def zebra_sweeps(op, u, b, sweeps: int, axis: int = 1):
    """``sweeps`` zebra line-relaxation sweeps of a :class:`VarStencilOp`.

    ``axis=1``: lines are grid rows, tridiagonal coupling along x (use when
    the strong coupling is in x); ``axis=0``: lines are columns.  Each sweep
    solves all odd-index lines exactly (off-line terms at current values),
    then all even-index lines.
    """
    shape = u.shape[-2:]
    box = op.box if op.box is not None else (1, op.n - 1, 1, op.n - 1)
    coef = op.coef
    dtype = u.dtype
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    line_idx = i if axis == 1 else j

    def offline_apply(v):
        """All stencil terms except the in-line tridiagonal ones."""
        acc = jnp.zeros_like(v)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                if axis == 1 and di == 0:
                    continue      # in-line (1,0)/(1,2)
                if axis == 0 and dj == 0:
                    continue      # in-line (0,1)/(2,1)
                acc = acc + coef[di + 1, dj + 1] * _shift2(v, di, dj)
        return acc

    def half(v, parity):
        rhs = b - offline_apply(v)
        dl, d, du, rhs, inter = _line_system(coef, rhs, v, axis, box, dtype)
        if axis == 0:
            sol = tridiag_pcr(dl.T, d.T, du.T, rhs.T).T
        else:
            sol = tridiag_pcr(dl, d, du, rhs)
        upd = inter & (line_idx % 2 == parity)
        return jnp.where(upd, sol.astype(dtype), v)

    for _ in range(sweeps):
        u = half(u, 1)
        u = half(u, 0)
    return u


def _shift2(u, di, dj):
    out = u
    if di:
        out = jnp.roll(out, -di, axis=-2)
    if dj:
        out = jnp.roll(out, -dj, axis=-1)
    return out

"""Fused Pallas TPU streaming smoothers for the 3D (7-point) hot path.

The 3D jnp smoothers run at ~13 % of the streaming ceiling on v5e
(``benchmarks/bench_ops3d.py``): XLA:TPU's relayouts for the minor-axis
rolls dominate.  These kernels reuse the 2D ghost-zone temporal-blocking
design (``kernels/stencil.py``) through a **fused-row view**: an
``(Sz, Sy, Sx)`` grid reshaped to ``(Sz*Sy, Sx)`` — a plane-major stack of
z-slices — where

* the x-neighbor is a lane roll (axis 1, shift 1),
* the y-neighbor is a sublane roll (axis 0, shift 1),
* the z-neighbor is a sublane roll by a full plane (axis 0, shift Sy).

Roll wrap-around *within* the window crosses plane seams (row ``z*Sy - 1``
wraps into plane ``z``'s y=0 row, and the z-roll wraps the window edges),
but every contaminated row has ``y in {0, >=n}`` or ``z in {0, >=n}`` —
outside the interior box — so the same inline iota masks that enforce the
Dirichlet boundary also annihilate the seam contamination.  The fused view
therefore needs *no* strided ops at all: Mosaic sees a plain 2D stencil.

Tiling: two-axis (z, y) ghost zones (``_tiles3``): each window is
``(TZ+2HZ, TY+2HY, Sx)`` copied by one 3D DMA (z offsets are free — the
axis is untiled in HBM; y slices are sublane-aligned) and reshaped to
fused rows *in VMEM* with the window's own ``WY`` as the plane stride.
Every window-plane's local y-edge rows coincide with the window's y-halo
edges, so all wrap contamination lives in the halo shrink region — the
validity argument of the 2D kernels carries over per axis.  Redundant
traffic stays ~1.3-1.4x at every grid size (z-only slabs degrade with
``Sy``).  The lane axis is never sliced but Mosaic requires it 128-aligned
for any HBM memref slice, hence ``Sx % 128 == 0`` (non-cubic padding, free
in HBM — XLA lane-pads the minor dim anyway).  Grids built with
``Poisson3DProblem(align=8, min_pad_level=0, lane_align=128)`` qualify.

Reference: the strictly-2D smoother loop at ``Poissons_SYCL.cpp:138-144``;
this module is the 3D analogue of ``kernels/stencil.py``'s replacement.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _roll

# Per-window VMEM footprint target.  Scratch holds four windows (u and b,
# double-buffered); Mosaic additionally stack-allocates ~4-5 window-sized
# compute temporaries for the unrolled roll/add chains, so the hard
# vmem_limit is set to ~9x this figure (v5e VMEM is 128 MB).
WINDOW_BYTES = 10 * 2 ** 20
# Smallest lane extent the streaming kernel accepts (below: jnp path;
# coarse 3D levels are latency-bound).
MIN_SIZE = 128


def _round_up(x: int, q: int) -> int:
    return (x + q - 1) // q * q


def _row_bytes(S: int, dtype) -> int:
    return _round_up(S, 128) * jnp.dtype(dtype).itemsize


def _tiles3(shape, H: int, dtype):
    """(TZ, HZ, TY, HY) tile/halo extents per axis, or None if infeasible.

    Two-axis ghost-zone blocking: the window is ``(TZ+2HZ, TY+2HY, Sx)``
    with ``HZ = H`` (z is untiled in HBM — any offset/size) and ``HY``
    = ``H`` rounded up to the sublane quantum 8.  Extents are chosen to
    fill ``WINDOW_BYTES`` while balancing the relative halo overhead of
    the two axes (``2HZ/TZ ~ 2HY/TY``); a whole axis that fits gets no
    halo.  Unlike z-only slabs, redundancy stays ~1.3-1.4x at every grid
    size.
    """
    Sz, Sy, Sx = shape
    rb = _row_bytes(Sx, dtype)
    rows = WINDOW_BYTES // rb          # (z, y) cells per window
    if rows >= Sz * Sy:
        return Sz, 0, Sy, 0            # single halo-free tile
    HZ, HY = H, _round_up(H, 8)
    if rows >= Sy * (2 * HZ + 1):      # full-y z-slabs feasible
        tz_full = min(rows // Sy - 2 * HZ, Sz)
        red_full = (tz_full + 2 * HZ) / tz_full
    else:
        tz_full, red_full = 0, float("inf")
    # balanced 2-axis tile: TZ/TY ~ HZ/HY, (TZ+2HZ)(TY+2HY) = rows
    import math
    a = HZ / HY
    disc = (2 * HY * a + 2 * HZ) ** 2 + 4 * a * rows
    ty = int(((-(2 * HY * a + 2 * HZ) + math.sqrt(disc)) / (2 * a)))
    ty = min(_round_up(ty, 8) - 8, Sy - 2 * HY)
    ty = ty // 8 * 8
    if ty >= 8:
        tz = min(rows // (ty + 2 * HY) - 2 * HZ, Sz)
        red_two = ((tz + 2 * HZ) * (ty + 2 * HY)) / (tz * ty)             if tz >= 1 else float("inf")
    else:
        tz, red_two = 0, float("inf")
    if red_full <= red_two:
        if tz_full < 1:
            return None
        return tz_full, (HZ if tz_full < Sz else 0), Sy, 0
    if tz < 1:
        return None
    return tz, HZ, ty, HY


def supported3(shape, dtype, steps: int = 1) -> bool:
    """Whether the streaming kernel handles an (Sz, Sy, Sx) padded grid.

    Requirements: f32; ``Sy % 8 == 0`` (sublane-aligned y slices),
    ``Sx % 128 == 0`` (Mosaic HBM slices need the minor dim lane-aligned),
    and a feasible tile under the VMEM budget.  ``Poisson3DProblem(align=8,
    min_pad_level=0, lane_align=128)`` builds qualifying grids.
    """
    if isinstance(shape, int):
        shape = (shape, shape, shape)
    Sz, Sy, Sx = shape
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if Sx < MIN_SIZE or Sx % 128 != 0 or Sy % 8 != 0 or Sy < 16:
        return False
    return _tiles3(shape, max(steps, 1), dtype) is not None


# ---------------------------------------------------------------------------
# Window step functions (fused-row view)
# ---------------------------------------------------------------------------

def _nbr3(x, Sy: int):
    """Six-face neighbor sum in the fused-row view (see module docstring)."""
    wr, wc = x.shape
    return (_roll(x, 1, 1) + _roll(x, wc - 1, 1)          # x +/- 1
            + _roll(x, 1, 0) + _roll(x, wr - 1, 0)        # y +/- 1
            + _roll(x, Sy % wr, 0) + _roll(x, (wr - Sy) % wr, 0))  # z +/- 1


def _jacobi_step3(omega, Sy: int):
    def step(state, b, interior, parity, j):
        w = omega[j % len(omega)] if isinstance(omega, tuple) else omega
        upd = ((1.0 - w) * state
               + (w / 6.0) * (b + _nbr3(state, Sy))).astype(state.dtype)
        return jnp.where(interior, upd, jnp.zeros((), state.dtype))
    return step


def _rbgs_step3(Sy: int):
    def step(state, b, interior, parity, j):
        upd = ((1.0 / 6.0) * (b + _nbr3(state, Sy))).astype(state.dtype)
        color = interior & (parity == (j % 2))
        return jnp.where(color, upd, state)
    return step


def _residual_of3(state, b, interior, Sy: int):
    r = (b - 6.0 * state + _nbr3(state, Sy)).astype(state.dtype)
    return jnp.where(interior, r, jnp.zeros((), state.dtype))


# ---------------------------------------------------------------------------
# Generic static 3x3x3 stencil (constant weights known at trace time)
# ---------------------------------------------------------------------------
#
# ``stencil[dz+1][dy+1][dx+1]`` multiplies u[i+dz, j+dy, k+dx] in
# (A u)[i, j, k] — compile-time floats, zero stored volumes, zero extra
# HBM traffic vs the 7-point kernels.  Covers the 3D Mehrstellen 19-point
# operator (core.operators.Const19Op) and the rotated constant-tensor
# 19-point operator (problems.anisotropic3d.Rotated3DOp).  Zero entries
# are skipped at trace time (a 19-point stencil costs 18 roll-FMA terms).

def _off_app27(x, w, wy: int):
    """Off-diagonal application sum_{d != 0} w[d] * x[i+d] on the fused
    (WZ*wy, Sx) row view (z shift = dz*wy rows, y = dy rows, x = dx
    cols).

    The z and y shifts are BOTH axis-0 rolls of the fused view, so they
    compose into ONE roll of (dz*wy + dy) rows per (dz, dy) pair — at
    most 4 vector values live at a time (x, row, term, out).  The naive
    nested form kept the plane/row pyramid live across the unrolled
    sweep chain and blew Mosaic's scoped-vmem stack on the real chip
    (r5: 119.8 MB vs the 112.4 MB limit for a 3-sweep 19-point K1₃)."""
    R, C = x.shape
    out = None
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            cs = [w[dz + 1][dy + 1][dx + 1] for dx in (-1, 0, 1)]
            if dz == 0 and dy == 0:
                cs[1] = 0.0                    # skip the center tap
            if not any(c != 0.0 for c in cs):
                continue
            shift = (-(dz * wy + dy)) % R
            row = x if shift == 0 else _roll(x, shift, 0)
            for dx, c in zip((-1, 0, 1), cs):
                if c == 0.0:
                    continue
                t = row if dx == 0 else _roll(row, (-dx) % C, 1)
                term = c * t
                out = term if out is None else out + term
    return out if out is not None else jnp.zeros_like(x)


def _jacobi27_step(omega, w, wy: int):
    """Weighted Jacobi on a static 3x3x3 stencil (fused-row view),
    mirroring ``Const19Op.smooth`` / ``Rotated3DOp.smooth``:
    v <- (1-om)v + (om/diag)(b - offapp(v))."""
    inv_d = 1.0 / w[1][1][1]

    def step(state, b, interior, parity, j):
        om = omega[j % len(omega)] if isinstance(omega, tuple) else omega
        upd = ((1.0 - om) * state
               + (om * inv_d)
               * (b - _off_app27(state, w, wy))).astype(state.dtype)
        return jnp.where(interior, upd, jnp.zeros((), state.dtype))
    return step


def _rbgs27_step(w, wy: int):
    """Parity-masked damped block relaxation (edge/corner terms couple
    same-color nodes — same caveat as ``Const19Op.smooth``)."""
    inv_d = 1.0 / w[1][1][1]

    def step(state, b, interior, parity, j):
        upd = (inv_d * (b - _off_app27(state, w, wy))).astype(state.dtype)
        color = interior & (parity == (j % 2))
        return jnp.where(color, upd, state)
    return step


def _residual27_of(state, b, interior, w, wy: int):
    r = (b - w[1][1][1] * state
         - _off_app27(state, w, wy)).astype(state.dtype)
    return jnp.where(interior, r, jnp.zeros((), state.dtype))


# ---------------------------------------------------------------------------
# Streaming harness ((z, y)-tiled double-buffered DMA, fused-row compute)
# ---------------------------------------------------------------------------

def _streamed3(u, b, *, n: int, steps: int, step_factory,
               want_residual: bool, origin=None):
    """``origin``: optional (1, 2) int32 array of the block's global
    (z, y) coordinates of element (0, 0, 0) — the distributed path runs
    these kernels on ghost-extended local blocks whose masks must use
    global coordinates (dist.pallas_cycle3).  None = origin (0, 0)."""
    Sz, Sy, Sx = u.shape
    dtype = u.dtype
    H = steps + (1 if want_residual else 0)
    TZ, HZ, TY, HY = _tiles3(u.shape, max(H, 1), dtype)
    WZ, WY = TZ + 2 * HZ, TY + 2 * HY
    ntz = pl.cdiv(Sz, TZ)
    nty = pl.cdiv(Sy, TY)
    nt = ntz * nty

    def kernel(org_smem, u_hbm, b_hbm, out_u, out_r_or_none, u_buf, b_buf,
               in_sem, out_sem):
        def tile_coords(t):
            tz = t // nty
            ty = t % nty
            # z is untiled in HBM (free offsets); y slices stay sublane-
            # aligned: TY/HY/Sy/WY are all multiples of 8.
            z0 = jnp.clip(tz * TZ - HZ, 0, Sz - WZ)
            y0 = pl.multiple_of(jnp.clip(ty * TY - HY, 0, Sy - WY), 8)
            zo = jnp.clip(tz * TZ, 0, Sz - TZ)
            yo = pl.multiple_of(jnp.clip(ty * TY, 0, Sy - TY), 8)
            return z0, y0, zo, yo

        def in_dmas(slot, t):
            z0, y0, _, _ = tile_coords(t)
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(z0, WZ), pl.ds(y0, WY)], u_buf.at[slot],
                    in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(z0, WZ), pl.ds(y0, WY)], b_buf.at[slot],
                    in_sem.at[slot, 1]),
            )

        def out_dmas(slot, t):
            z0, y0, zo, yo = tile_coords(t)
            oz = zo - z0
            oy = pl.multiple_of(yo - y0, 8)
            dmas = [pltpu.make_async_copy(
                u_buf.at[slot, pl.ds(oz, TZ), pl.ds(oy, TY)],
                out_u.at[pl.ds(zo, TZ), pl.ds(yo, TY)],
                out_sem.at[slot, 0])]
            if want_residual:
                dmas.append(pltpu.make_async_copy(
                    b_buf.at[slot, pl.ds(oz, TZ), pl.ds(oy, TY)],
                    out_r_or_none.at[pl.ds(zo, TZ), pl.ds(yo, TY)],
                    out_sem.at[slot, 1]))
            return dmas

        for d in in_dmas(0, 0):
            d.start()

        def body(t, carry):
            slot = t % 2
            nxt = 1 - slot

            @pl.when(t >= 1)
            def _():
                for d in out_dmas(nxt, t - 1):
                    d.wait()

            @pl.when(t + 1 < nt)
            def _():
                for d in in_dmas(nxt, t + 1):
                    d.start()

            for d in in_dmas(slot, t):
                d.wait()

            z0, y0, _, _ = tile_coords(t)
            # Fused-row GLOBAL coordinates over the (WZ*WY, Sx) view.
            fr = jax.lax.broadcasted_iota(jnp.int32, (WZ * WY, Sx), 0)
            gz = z0 + org_smem[0, 0] + fr // WY
            gy = y0 + org_smem[0, 1] + fr % WY
            gx = jax.lax.broadcasted_iota(jnp.int32, (WZ * WY, Sx), 1)
            interior = ((gz >= 1) & (gz <= n - 1) & (gy >= 1)
                        & (gy <= n - 1) & (gx >= 1) & (gx <= n - 1))
            parity = (gz + gy + gx) % 2

            step_fn = step_factory(WY)
            state = u_buf[slot].reshape(WZ * WY, Sx)
            bwin = b_buf[slot].reshape(WZ * WY, Sx)
            for j in range(steps):
                state = step_fn(state, bwin, interior, parity, j)
            u_buf[slot] = state.reshape(WZ, WY, Sx)
            if want_residual:
                r = _residual_of3(state, bwin, interior, WY)
                b_buf[slot] = r.reshape(WZ, WY, Sx)

            for d in out_dmas(slot, t):
                d.start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    out_shape = [jax.ShapeDtypeStruct((Sz, Sy, Sx), dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if want_residual:
        out_shape.append(jax.ShapeDtypeStruct((Sz, Sy, Sx), dtype))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    n_out_ch = 2 if want_residual else 1
    bytes_win = WZ * WY * _row_bytes(Sx, dtype)

    kern = kernel if want_residual else (
        lambda org, u_hbm, b_hbm, out_u, *scr: kernel(org, u_hbm, b_hbm,
                                                      out_u, None, *scr))

    if origin is None:
        origin = jnp.zeros((1, 2), jnp.int32)

    result = pl.pallas_call(
        kern,
        out_shape=tuple(out_shape) if want_residual else out_shape[0],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(out_specs) if want_residual else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(9.5 * bytes_win) + 2 ** 21,
                                 127 * 2 ** 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WZ * WY * Sx * (10 * steps
                                           + (8 if want_residual else 0))),
            bytes_accessed=int(Sz * Sy * Sx * jnp.dtype(dtype).itemsize
                               * (2 + n_out_ch)),
            transcendentals=0,
        ),
    )(origin, u, b)
    return result


# ---------------------------------------------------------------------------
# Public entry points (drop-in replacements for core.ops3d)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "omega", "sweeps"))
def jacobi_sweeps3(u, b, n: int, omega, sweeps: int):
    """k fused weighted-Jacobi sweeps in ~3 HBM passes of the cube."""
    if sweeps <= 0:
        return u
    om = omega if isinstance(omega, tuple) else float(omega)
    return _streamed3(u, b, n=n, steps=sweeps,
                      step_factory=lambda wy: _jacobi_step3(om, wy),
                      want_residual=False)


@functools.partial(jax.jit, static_argnames=("n", "omega", "sweeps"))
def jacobi_sweeps_residual3(u, b, n: int, omega, sweeps: int):
    """k fused Jacobi sweeps + the residual of the result, ~4 HBM passes."""
    om = omega if isinstance(omega, tuple) else float(omega)
    return _streamed3(u, b, n=n, steps=sweeps,
                      step_factory=lambda wy: _jacobi_step3(om, wy),
                      want_residual=True)


@functools.partial(jax.jit, static_argnames=("n", "sweeps"))
def rbgs_sweeps3(u, b, n: int, sweeps: int):
    """k fused red-black GS sweeps (2k half-sweeps), 3D checkerboard."""
    if sweeps <= 0:
        return u
    return _streamed3(u, b, n=n, steps=2 * sweeps,
                      step_factory=_rbgs_step3, want_residual=False)


@functools.partial(jax.jit, static_argnames=("n", "sweeps"))
def rbgs_sweeps_residual3(u, b, n: int, sweeps: int):
    return _streamed3(u, b, n=n, steps=2 * sweeps,
                      step_factory=_rbgs_step3, want_residual=True)


@functools.partial(jax.jit, static_argnames=("n",))
def residual3(u, b, n: int):
    """r = b - A u as one streamed kernel (3 HBM passes)."""
    _, r = _streamed3(u, b, n=n, steps=0,
                      step_factory=lambda wy: _jacobi_step3(1.0, wy),
                      want_residual=True)
    return r

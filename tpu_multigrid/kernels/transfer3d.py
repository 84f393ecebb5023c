"""Fused 3D V-cycle super-kernels: smooth+residual+restrict (K1₃) and
prolong+correct+smooth (K2₃).

The 3D lift of ``kernels/transfer.py``: a V-cycle level visit becomes two
kernel launches totalling ~6.5 HBM passes of the fine cube instead of ~12
for the separate stencil3d smoothers + XLA transfers (and the XLA
trilinear prolongation alone costs ~2.6 ms at 257³ — here it never leaves
VMEM).

Geometry (two-axis (z, y) tiling over non-cubic ``(Sz, Sy, Sx)`` grids,
``kernels/stencil3d.py``):

* x (lane) is never tiled; fine ``Sx % 128 == 0``, coarse ``Scx`` likewise.
  The decimated x extent ``Sx // 2`` is lane-padded up to ``Scx`` in VMEM
  before the coarse write, so coarse DMAs always cover full rows.
* z is untiled in HBM — offsets are free; parity of window origins is kept
  even (``TZ``, ``HZ`` even) so the restrict/prolong parity reshapes are
  static.
* y slices must be sublane-aligned *on both grids*: fine tile ``TY`` and
  grid ``Sy`` are multiples of 16 and the y halo is 16, making every
  coarse-side offset (``y/2``) a multiple of 8.

In-kernel transfer machinery (Mosaic supplies no strided vector ops):
restriction is the separable [½,1,½] blur (six rolls on the fused-row
view) + per-axis parity decimation — leading-axis reshapes for z/y, the
transpose+row trick for x (``transfer._row_deinterleave``); prolongation
is eight roll-averaged parity phases merged by stack+reshape interleaves
(z, y) and the transpose trick (x), the in-VMEM form of
``core.ops3d.prolong3``.

Reference: the strictly-2D V-cycle level visit at
``Poissons_SYCL.cpp:575-627``; see SURVEY.md §3.4 for the cost model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _roll
from .stencil3d import (WINDOW_BYTES, _jacobi27_step, _jacobi_step3,
                        _rbgs27_step, _rbgs_step3, _residual27_of,
                        _residual_of3, _round_up, _row_bytes)
from .transfer import _row_deinterleave


def _step_fn3(smoother, omega, wy, stencil=None):
    """``stencil``: optional static 3x3x3 weights
    (stencil[dz+1][dy+1][dx+1] multiplies u[i+dz, j+dy, k+dx]) replacing
    the hard-wired 7-point Poisson operator — zero extra HBM traffic
    (kernels/stencil3d._off_app27; 3D Mehrstellen / rotated tensors)."""
    om = omega if isinstance(omega, tuple) else float(omega)
    if smoother == "jacobi":
        return _jacobi27_step(om, stencil, wy) if stencil is not None \
            else _jacobi_step3(om, wy)
    elif smoother == "rbgs":
        return _rbgs27_step(stencil, wy) if stencil is not None \
            else _rbgs_step3(wy)
    raise ValueError(smoother)


def _chain3(state, b, interior, parity, steps, smoother, omega, wy,
            stencil):
    """Python-unrolled sweep chain (an in-kernel fori_loop variant was
    measured to GROW Mosaic's scoped-vmem stack, 12.5x -> 15x window
    bytes — loop-carried state costs more than unrolled liveness)."""
    step = _step_fn3(smoother, omega, wy, stencil)
    for j in range(steps):
        state = step(state, b, interior, parity, j)
    return state


def _resid_of3(state, b, interior, wy, stencil=None):
    if stencil is not None:
        return _residual27_of(state, b, interior, stencil, wy)
    return _residual_of3(state, b, interior, wy)


def _core_y(TY, WY, steps):
    """Compute-core fine-y geometry for the sweep chain: (CHY, KWY).

    The 16-row fine y halo exists for offset alignment (coarse y offsets
    must stay 8-aligned); the chain semantically needs only steps+2 rings,
    so the smoothing steps run on a (WZ, KWY, Sx) core slice — the 3D
    y-axis analogue of transfer._core_geom (z halos are already
    depth-tight, x is untiled).  Residual/blur/prolong stay full-window;
    the stale y-strips they read are masked or never DMA'd out (the same
    argument as the 2D shrink).  Falls back to the full halo when the
    chain exceeds the 8-ring contamination budget."""
    hy = (WY - TY) // 2
    chy = 8 if (hy == 16 and steps + 2 <= 8) else hy
    return chy, TY + 2 * chy


def _masks3(z0, y0, WZ, WY, Sx, n, box=None):
    """(interior, parity) over the fused (WZ*WY, Sx) window view.

    ``box``: optional inclusive unknown box (i0, i1, j0, j1, k0, k1) in
    (z, y, x) order replacing the Dirichlet interior (mixed-BC
    problems, problems/mixedbc3d.py)."""
    fr = jax.lax.broadcasted_iota(jnp.int32, (WZ * WY, Sx), 0)
    gz = z0 + fr // WY
    gy = y0 + fr % WY
    gx = jax.lax.broadcasted_iota(jnp.int32, (WZ * WY, Sx), 1)
    i0, i1, j0, j1, k0, k1 = box if box is not None else (
        1, n - 1, 1, n - 1, 1, n - 1)
    interior = ((gz >= i0) & (gz <= i1) & (gy >= j0) & (gy <= j1)
                & (gx >= k0) & (gx <= k1))
    return interior, (gz + gy + gx) % 2


# 27-point static stencils run ~26 roll-FMA temporaries per application —
# Mosaic's scoped-VMEM stack for the kernel body scales with the live
# roll chain, not just the window arrays.  Measured on v5e (r5): the
# 10 MB 7-point window budget put the 27-point K1₃ at 119.8 MB of
# scoped vmem vs the 112.4 MB limit (compile-time OOM).  Half the
# window halves the stack with ~6 % extra halo redundancy.
S27_WINDOW_BYTES = 2 * 2 ** 20


# ---------------------------------------------------------------------------
# K1₃ geometry
# ---------------------------------------------------------------------------

def _tiles_k1(shape, H: int, dtype, budget=None):
    """(TZ, HZ, TY, HY) for K1₃, or None.

    Quanta: TZ/HZ even (static decimation parity), TY multiple of 16 with
    HY = 16 (coarse y offsets stay 8-aligned).  Balanced two-axis halos
    under the WINDOW_BYTES budget (or ``budget`` when given — the
    var-coefficient kernels stream extra slabs and use smaller windows),
    with whole-axis fallbacks.
    """
    Sz, Sy, Sx = shape
    rb = _row_bytes(Sx, dtype)
    rows = (budget if budget is not None else WINDOW_BYTES) // rb
    HZ = _round_up(H, 2)
    HY = 16
    if rows >= Sz * Sy:
        return Sz, 0, Sy, 0
    if rows >= Sy * (2 * HZ + 2):          # full-y z-slabs
        tz_full = min((rows // Sy - 2 * HZ) // 2 * 2, Sz - 2 * HZ, Sz)
        red_full = (tz_full + 2 * HZ) / tz_full if tz_full >= 2 \
            else float("inf")
    else:
        tz_full, red_full = 0, float("inf")
    import math
    a = HZ / HY
    disc = (2 * HY * a + 2 * HZ) ** 2 + 4 * a * rows
    ty = int((-(2 * HY * a + 2 * HZ) + math.sqrt(disc)) / (2 * a))
    ty = min(_round_up(ty, 16) - 16, Sy - 2 * HY)
    ty = ty // 16 * 16
    if ty >= 16:
        tz = min((rows // (ty + 2 * HY) - 2 * HZ) // 2 * 2, Sz - 2 * HZ)
        red_two = ((tz + 2 * HZ) * (ty + 2 * HY)) / (tz * ty) \
            if tz >= 2 else float("inf")
    else:
        tz, red_two = 0, float("inf")
    if red_full <= red_two:
        if tz_full < 2:
            return None
        return tz_full, (HZ if tz_full < Sz else 0), Sy, 0
    if tz < 2:
        return None
    return tz, HZ, ty, HY


def supported3(shape, shape_c, steps: int, dtype) -> bool:
    """Whether K1₃/K2₃ apply for a fine/coarse level pair.

    ``steps`` is the larger of the two smoothing step counts.
    """
    if isinstance(shape, int):
        shape = (shape, shape, shape)
    if isinstance(shape_c, int):
        shape_c = (shape_c, shape_c, shape_c)
    Sz, Sy, Sx = shape
    Szc, Syc, Scx = shape_c
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if Sx % 128 or Scx % 128 or Sx < 256:
        return False
    if Sy % 16 or Syc % 8 or Sz % 2:
        return False
    if steps + 2 > 16:                      # y halo bound
        return False
    # coarse array must cover the decimated/required extents
    if 2 * Szc < Sz or 2 * Syc < Sy or 2 * Scx < Sx:
        return False
    if _tiles_k1(shape, steps + 2, dtype) is None:
        return False
    if _tiles_k2(shape, steps + 1, dtype) is None:
        return False
    return True


# ---------------------------------------------------------------------------
# In-VMEM restriction: blur (fused view) + parity decimation
# ---------------------------------------------------------------------------

def _blur3(r, WY: int, edge0=None):
    """Separable [0.5, 1, 0.5]³ blur on the fused (WZ*WY, Sx) view.

    ``edge0 = (z0mask, y0mask, x0mask)`` (each (R, Sx) bool or None)
    zero-fills the minus-direction sample at global coordinate 0 — the
    in-window roll would otherwise wrap live values there.  Only needed
    when a mixed-BC box keeps edge-0 unknowns (coordinate 0 is masked
    dead in the Dirichlet case, so the default wrap is harmless)."""
    R, C = r.shape
    mz, my, mx = edge0 if edge0 is not None else (None, None, None)
    zero = jnp.zeros((), r.dtype)
    xm = _roll(r, 1, 1)
    if mx is not None:
        xm = jnp.where(mx, zero, xm)
    t = r + 0.5 * (xm + _roll(r, C - 1, 1))                       # x
    ym = _roll(t, 1, 0)
    if my is not None:
        ym = jnp.where(my, zero, ym)
    t = t + 0.5 * (ym + _roll(t, R - 1, 0))                       # y
    zm = _roll(t, WY % R, 0)
    if mz is not None:
        zm = jnp.where(mz, zero, zm)
    t = t + 0.5 * (zm + _roll(t, (R - WY) % R, 0))                # z
    return t


def _decimate3(t, WZ: int, WY: int):
    """Even-index decimation per axis: (WZ*WY, Sx) -> (WZ/2 * WY/2, Sx/2).

    Window origins are even on every axis, so "even global" == "even
    local".  y first (fused-row deinterleave), then z (leading-axis
    reshape), then x (transpose + row trick).
    """
    R, C = t.shape
    t = _row_deinterleave(t)                        # y: (WZ*WY/2, C)
    t = t.reshape(WZ // 2, 2, WY // 2, C)[:, 0]     # z: even planes
    t = t.reshape(WZ // 2 * (WY // 2), C)
    return _row_deinterleave(t.T).T                 # x: (.., C/2)


def _rep2_rows_blk(a, blk: int):
    """(R, C) -> (2R, C) doubling each contiguous block of ``blk`` rows:
    blk=1 doubles every row (y replication on the fused view); blk=Wyc
    doubles whole z-planes."""
    r, c = a.shape
    return jnp.broadcast_to(a.reshape(r // blk, 1, blk, c),
                            (r // blk, 2, blk, c)).reshape(2 * r, c)


def _prolong3_vmem(c, Wzc: int, Wyc: int):
    """Trilinear prolongation on VMEM values: coarse (Wzc*Wyc, Cc) fused
    view -> fine (2Wzc * 2Wyc, 2Cc) fused view (plane stride 2*Wyc).

    Formulated as nearest-neighbor 2x replication per axis followed by one
    averaging roll per axis on the fine view (the 3D analogue of the 2D
    kernel's repeat2x2+rolls form, transfer.py:_bilinear_prolong) —
    algebraically identical to interleaving the eight parity-phase
    averages but far fewer interleave/transpose stages on the VPU.  Wrap
    garbage (including y-rolls crossing plane seams in the fused view)
    lands outside the valid region, which the caller's masks zero.
    """
    E = _rep2_rows_blk(c, Wyc)                  # z: (2Wzc*Wyc, Cc)
    E = _rep2_rows_blk(E, 1)                    # y: (2Wzc*2Wyc, Cc)
    E = _rep2_rows_blk(E.T, 1).T                # x: (2Wzc*2Wyc, 2Cc)
    R2, C2 = E.shape
    F = 0.5 * (E + _roll(E, C2 - 1, 1))                     # x average
    F = 0.5 * (F + _roll(F, R2 - 1, 0))                     # y average
    return 0.5 * (F + _roll(F, (R2 - 2 * Wyc) % R2, 0))     # z average


# ---------------------------------------------------------------------------
# K1₃: pre-smooth + residual + full-weighting restrict
# ---------------------------------------------------------------------------

def _smooth_restrict3(u, b, *, n, shape_c, steps, smoother, omega,
                      origin=None, ghost=(0, 0), stencil=None):
    """Returns (u', rc): u after ``steps`` smoothing steps and the
    restricted residual on the coarse grid.  ~3.3 HBM passes of the cube.

    ``origin``/``ghost``: distributed mode (dist.pallas_cycle3) — ``u``/
    ``b`` are ghost-extended local blocks whose element (0,0,0) sits at
    global (z, y) ``origin`` (a (1, 2) int32 array; must be even so the
    decimation parity stays static) with ``ghost=(GZ, GY)`` cells per
    side; the coarse output is the next level's extended block (fine
    local l -> coarse local l/2 + ghost/2).
    """
    Sz, Sy, Sx = u.shape
    Szc, Syc, Scx = shape_c
    gz2, gy2 = ghost[0] // 2, ghost[1] // 2
    dtype = u.dtype
    H = steps + 2                            # +1 residual ring, +1 blur ring
    TZ, HZ, TY, HY = _tiles_k1(u.shape, H, dtype,
                               budget=None if stencil is None
                               else S27_WINDOW_BYTES)
    WZ, WY = TZ + 2 * HZ, TY + 2 * HY
    CHY, KWY = _core_y(TY, WY, steps)
    ntz = pl.cdiv(Sz, TZ)
    nty = pl.cdiv(Sy, TY)
    nt = ntz * nty
    nc = n // 2
    Cx2 = Sx // 2

    def kernel(org_smem, u_hbm, b_hbm, out_u, out_rc, u_buf, b_buf, rc_buf,
               in_sem, out_sem):
        def coords(t):
            tz = t // nty
            ty = t % nty
            z0 = jnp.clip(tz * TZ - HZ, 0, Sz - WZ)
            y0 = pl.multiple_of(jnp.clip(ty * TY - HY, 0, Sy - WY), 16)
            zo = jnp.clip(tz * TZ, 0, Sz - TZ)
            yo = pl.multiple_of(jnp.clip(ty * TY, 0, Sy - TY), 16)
            return z0, y0, zo, yo

        def in_dmas(slot, t):
            z0, y0, _, _ = coords(t)
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(z0, WZ), pl.ds(y0, WY)], u_buf.at[slot],
                    in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(z0, WZ), pl.ds(y0, WY)], b_buf.at[slot],
                    in_sem.at[slot, 1]),
            )

        def out_dmas(slot, t):
            z0, y0, zo, yo = coords(t)
            oz = zo - z0
            oy = pl.multiple_of(yo - y0, 16)
            return (
                pltpu.make_async_copy(
                    u_buf.at[slot, pl.ds(oz, TZ), pl.ds(oy, TY)],
                    out_u.at[pl.ds(zo, TZ), pl.ds(yo, TY)],
                    out_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    rc_buf.at[slot, pl.ds(oz // 2, TZ // 2),
                              pl.ds(pl.multiple_of(oy // 2, 8), TY // 2)],
                    out_rc.at[pl.ds(zo // 2 + gz2, TZ // 2),
                              pl.ds(pl.multiple_of(yo // 2 + gy2, 8),
                                    TY // 2)],
                    out_sem.at[slot, 1]),
            )

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

            z0, y0, _, yo = coords(t)
            if steps > 0 and KWY < WY:
                # Sweep chain on the y-core slice only (see _core_y).
                ky0 = pl.multiple_of(
                    jnp.clip((yo - y0) - CHY, 0, WY - KWY), 8)
                ik, pk = _masks3(z0 + org_smem[0, 0],
                                 y0 + ky0 + org_smem[0, 1], WZ, KWY, Sx, n)
                sk = u_buf[slot, :, pl.ds(ky0, KWY), :].reshape(
                    WZ * KWY, Sx)
                bk = b_buf[slot, :, pl.ds(ky0, KWY), :].reshape(
                    WZ * KWY, Sx)
                sk = _chain3(sk, bk, ik, pk, steps, smoother, omega,
                             KWY, stencil)
                u_buf[slot, :, pl.ds(ky0, KWY), :] = sk.reshape(
                    WZ, KWY, Sx)
                interior, _ = _masks3(z0 + org_smem[0, 0],
                                      y0 + org_smem[0, 1], WZ, WY, Sx, n)
                state = u_buf[slot].reshape(WZ * WY, Sx)
                bwin = b_buf[slot].reshape(WZ * WY, Sx)
            else:
                interior, parity = _masks3(z0 + org_smem[0, 0],
                                           y0 + org_smem[0, 1], WZ, WY,
                                           Sx, n)
                state = u_buf[slot].reshape(WZ * WY, Sx)
                bwin = b_buf[slot].reshape(WZ * WY, Sx)
                state = _chain3(state, bwin, interior, parity, steps,
                                smoother, omega, WY, stencil)
                u_buf[slot] = state.reshape(WZ, WY, Sx)
            r = _resid_of3(state, bwin, interior, WY, stencil)
            # R = P^T/2: separable blur + even-even-even decimation, /2.
            rc = 0.5 * _decimate3(_blur3(r, WY), WZ, WY)
            # coarse mask in global coarse coordinates
            fr = jax.lax.broadcasted_iota(
                jnp.int32, (WZ // 2 * (WY // 2), Cx2), 0)
            gz = (z0 + org_smem[0, 0]) // 2 + fr // (WY // 2)
            gy = (y0 + org_smem[0, 1]) // 2 + fr % (WY // 2)
            gx = jax.lax.broadcasted_iota(
                jnp.int32, (WZ // 2 * (WY // 2), Cx2), 1)
            cmask = ((gz >= 1) & (gz <= nc - 1) & (gy >= 1) & (gy <= nc - 1)
                     & (gx >= 1) & (gx <= nc - 1))
            rc = jnp.where(cmask, rc, jnp.zeros((), dtype))
            if Scx > Cx2:                    # lane-pad to the coarse width
                rc = jnp.concatenate(
                    [rc, jnp.zeros((rc.shape[0], Scx - Cx2), dtype)], 1)
            rc_buf[slot] = rc.reshape(WZ // 2, WY // 2, Scx)

            for d in out_dmas(slot, t):
                d.start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    bytes_win = WZ * WY * _row_bytes(Sx, dtype)
    if origin is None:
        origin = jnp.zeros((1, 2), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Sz, Sy, Sx), dtype),
                   jax.ShapeDtypeStruct((Szc, Syc, Scx), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, WZ // 2, WY // 2, Scx), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int((10.5 if stencil is None else 16.0) * bytes_win)
                + 2 ** 21, 127 * 2 ** 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WZ * WY * Sx * (10 * steps + 20)),
            bytes_accessed=int(Sz * Sy * Sx * 4 * 3.3),
            transcendentals=0,
        ),
    )(origin, u, b)


# ---------------------------------------------------------------------------
# K2₃: prolong + add correction + post-smooth (+ optional fused resnorm)
# ---------------------------------------------------------------------------

def _tiles_k2(shape, H: int, dtype, budget=None):
    """(TZ, TY, HZc, HYc) for K2₃, or None.

    Fine tile (TZ, TY) with TZ even, TY mult 16; coarse halos
    ``HZc = ceil((H+1)/2)`` (no alignment needed — z offsets are free) and
    ``HYc = 8``.  The fine window is exactly 2x the coarse window.
    """
    Sz, Sy, Sx = shape
    rb = _row_bytes(Sx, dtype)
    rows = (budget if budget is not None else WINDOW_BYTES) // rb
    HZc = (H + 2) // 2
    HYc = 8
    if rows >= Sz * Sy:
        return Sz, Sy, 0, 0
    # fine window rows = (TZ + 4*HZc... ) * (TY + 4*HYc): solve balanced
    hz_f, hy_f = 2 * HZc, 2 * HYc            # effective fine halos
    if rows >= Sy * (2 * hz_f + 2):
        tz_full = min((rows // Sy - 2 * hz_f) // 2 * 2, Sz - 2 * hz_f, Sz)
        red_full = (tz_full + 2 * hz_f) / tz_full if tz_full >= 2 \
            else float("inf")
    else:
        tz_full, red_full = 0, float("inf")
    import math
    a = hz_f / hy_f
    disc = (2 * hy_f * a + 2 * hz_f) ** 2 + 4 * a * rows
    ty = int((-(2 * hy_f * a + 2 * hz_f) + math.sqrt(disc)) / (2 * a))
    ty = min(_round_up(ty, 16) - 16, Sy - 2 * hy_f)
    ty = ty // 16 * 16
    if ty >= 16:
        tz = min((rows // (ty + 2 * hy_f) - 2 * hz_f) // 2 * 2,
                 Sz - 2 * hz_f)
        red_two = ((tz + 2 * hz_f) * (ty + 2 * hy_f)) / (tz * ty) \
            if tz >= 2 else float("inf")
    else:
        tz, red_two = 0, float("inf")
    if red_full <= red_two:
        if tz_full < 2:
            return None
        return tz_full, Sy, (HZc if tz_full < Sz else 0), 0
    if tz < 2:
        return None
    return tz, ty, HZc, HYc


def _prolong_smooth3(u, b, ec, *, n, steps, smoother, omega,
                     want_resnorm=False, stencil=None):
    """u <- smooth(u + P e_c, b, steps); optionally also ||b - A u||²."""
    Sz, Sy, Sx = u.shape
    Szc, Syc, Scx = ec.shape
    dtype = u.dtype
    H = steps + (1 if want_resnorm else 0)
    TZ, TY, HZc, HYc = _tiles_k2(u.shape, H, dtype,
                                 budget=None if stencil is None
                                 else S27_WINDOW_BYTES)
    full_z, full_y = TZ == Sz, TY == Sy
    Wzc = Sz // 2 if full_z else TZ // 2 + 2 * HZc
    Wyc = Sy // 2 if full_y else TY // 2 + 2 * HYc
    WZ = Sz if full_z else 2 * Wzc
    WY = Sy if full_y else 2 * Wyc
    # The prolonged block is (2Wzc, 2Wyc) >= (WZ, WY); crop at use.
    CHY, KWY = _core_y(TY, WY, steps)
    ntz = pl.cdiv(Sz, TZ)
    nty = pl.cdiv(Sy, TY)
    nt = ntz * nty
    Cx2 = 2 * Scx

    def kernel(u_hbm, b_hbm, ec_hbm, out_u, out_ss, u_buf, b_buf, c_buf,
               ss_acc, in_sem, out_sem):
        def coords(t):
            tz = t // nty
            ty = t % nty
            zo = jnp.clip(tz * TZ, 0, Sz - TZ)
            yo = pl.multiple_of(jnp.clip(ty * TY, 0, Sy - TY), 16)
            # Clamp by the FINE bound: the fine window [2*c0, 2*c0 + W)
            # must fit in the fine array; this also keeps the coarse
            # window inside the coarse array since 2*Sc >= S (the 2D K2
            # clamp argument, transfer.py::_prolong_smooth.coords).
            if full_z:
                z0c = 0
            else:
                z0c = jnp.clip(zo // 2 - HZc, 0, (Sz - WZ) // 2)
            if full_y:
                y0c = 0
            else:
                y0c = pl.multiple_of(
                    jnp.clip(yo // 2 - HYc, 0, (Sy - WY) // 2), 8)
            return zo, yo, z0c, y0c

        def in_dmas(slot, t):
            zo, yo, z0c, y0c = coords(t)
            zf0 = 2 * z0c if not full_z else 0
            yf0 = pl.multiple_of(2 * y0c, 16) if not full_y else 0
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(zf0, WZ), pl.ds(yf0, WY)], u_buf.at[slot],
                    in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(zf0, WZ), pl.ds(yf0, WY)], b_buf.at[slot],
                    in_sem.at[slot, 1]),
                pltpu.make_async_copy(
                    ec_hbm.at[pl.ds(z0c, Wzc), pl.ds(y0c, Wyc)],
                    c_buf.at[slot], in_sem.at[slot, 2]),
            )

        def out_dma(slot, t):
            zo, yo, z0c, y0c = coords(t)
            oz = zo - (2 * z0c if not full_z else 0)
            oy = pl.multiple_of(yo - (2 * y0c if not full_y else 0), 16)
            return pltpu.make_async_copy(
                u_buf.at[slot, pl.ds(oz, TZ), pl.ds(oy, TY)],
                out_u.at[pl.ds(zo, TZ), pl.ds(yo, TY)],
                out_sem.at[slot])

        for d in in_dmas(0, 0):
            d.start()

        def body(t, carry):
            slot = t % 2
            nxt = 1 - slot

            @pl.when(t >= 1)
            def _():
                out_dma(nxt, t - 1).wait()

            @pl.when(t + 1 < nt)
            def _():
                for d in in_dmas(nxt, t + 1):
                    d.start()

            for d in in_dmas(slot, t):
                d.wait()

            zo, yo, z0c, y0c = coords(t)
            zf0 = 2 * z0c if not full_z else 0
            yf0 = 2 * y0c if not full_y else 0
            interior, parity = _masks3(zf0, yf0, WZ, WY, Sx, n)
            corr = _prolong3_vmem(
                c_buf[slot].reshape(Wzc * Wyc, Scx), Wzc, Wyc)
            # crop the (2Wzc * 2Wyc, 2Scx) block to the fine window
            corr = corr.reshape(2 * Wzc, 2 * Wyc, Cx2)[:WZ, :WY, :Sx]
            corr = corr.reshape(WZ * WY, Sx)
            state = jnp.where(interior,
                              u_buf[slot].reshape(WZ * WY, Sx) + corr,
                              jnp.zeros((), dtype))
            bwin = b_buf[slot].reshape(WZ * WY, Sx)
            if steps > 0 and KWY < WY:
                # Sweep chain on the y-core slice only (see _core_y).
                u_buf[slot] = state.reshape(WZ, WY, Sx)
                ky0 = pl.multiple_of(
                    jnp.clip((yo - yf0) - CHY, 0, WY - KWY), 8)
                ik, pk = _masks3(zf0, yf0 + ky0, WZ, KWY, Sx, n)
                sk = u_buf[slot, :, pl.ds(ky0, KWY), :].reshape(
                    WZ * KWY, Sx)
                bk = b_buf[slot, :, pl.ds(ky0, KWY), :].reshape(
                    WZ * KWY, Sx)
                sk = _chain3(sk, bk, ik, pk, steps, smoother, omega,
                             KWY, stencil)
                u_buf[slot, :, pl.ds(ky0, KWY), :] = sk.reshape(
                    WZ, KWY, Sx)
                state = u_buf[slot].reshape(WZ * WY, Sx)
            else:
                state = _chain3(state, bwin, interior, parity, steps,
                                smoother, omega, WY, stencil)
                u_buf[slot] = state.reshape(WZ, WY, Sx)
            if want_resnorm:
                tz = t // nty
                ty = t % nty
                fr = jax.lax.broadcasted_iota(jnp.int32, (WZ * WY, Sx), 0)
                gz = zf0 + fr // WY
                gy = yf0 + fr % WY
                gx = jax.lax.broadcasted_iota(jnp.int32, (WZ * WY, Sx), 1)
                claim = (interior
                         & (gz >= tz * TZ) & (gz < (tz + 1) * TZ)
                         & (gy >= ty * TY) & (gy < (ty + 1) * TY))
                r = jnp.where(claim,
                              _resid_of3(state, bwin, interior, WY, stencil),
                              jnp.zeros((), dtype)).astype(jnp.float32)
                ss_acc[0, 0] = ss_acc[0, 0] + jnp.sum(r * r)
            out_dma(slot, t).start()
            return carry

        ss_acc[0, 0] = jnp.float32(0.0)
        jax.lax.fori_loop(0, nt, body, 0)
        out_dma((nt - 1) % 2, nt - 1).wait()
        if want_resnorm:
            out_ss[0, 0] = ss_acc[0, 0]

    out_shape = [jax.ShapeDtypeStruct((Sz, Sy, Sx), dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if want_resnorm:
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    kern = kernel if want_resnorm else (
        lambda u_hbm, b_hbm, ec_hbm, out_u, *scr: kernel(
            u_hbm, b_hbm, ec_hbm, out_u, None, *scr))

    bytes_win = WZ * WY * _row_bytes(Sx, dtype)
    result = pl.pallas_call(
        kern,
        out_shape=tuple(out_shape) if want_resnorm else out_shape[0],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=tuple(out_specs) if want_resnorm else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, Wzc, Wyc, Scx), dtype),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int((11.5 if stencil is None else 17.0) * bytes_win)
                + 2 ** 21, 127 * 2 ** 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WZ * WY * Sx * (10 * steps + 16)),
            bytes_accessed=int(Sz * Sy * Sx * 4 * 3.3),
            transcendentals=0,
        ),
    )(u, b, ec)
    if want_resnorm:
        u_out, ss = result
        return u_out, jnp.sqrt(ss[0, 0])
    return result


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "shape_c", "sweeps",
                                             "smoother", "omega",
                                             "stencil"))
def smooth_restrict3(u, b, n, shape_c, sweeps, smoother="jacobi",
                     omega=2.0 / 3.0, stencil=None):
    """``sweeps`` pre-smoothing sweeps, then residual + FW restriction.

    ``stencil``: optional static 3x3x3 weights (constant compact
    operators — 3D Mehrstellen, rotated tensors) replacing the 7-point
    Poisson stencil."""
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    un, rc = _smooth_restrict3(u, b, n=n, shape_c=tuple(shape_c),
                               steps=steps, smoother=smoother, omega=omega,
                               stencil=stencil)
    # The tile grid covers coarse indices [0, S/2) per axis; zero the
    # remaining (non-physical) tail so the zero-outside-interior invariant
    # holds for downstream ops (2D transfer.smooth_restrict does the same).
    Sz, Sy, _ = u.shape
    Szc, Syc, Scx = rc.shape
    hz, hy = Sz // 2, Sy // 2
    if Szc > hz:
        rc = jax.lax.dynamic_update_slice(
            rc, jnp.zeros((Szc - hz, Syc, Scx), rc.dtype), (hz, 0, 0))
    if Syc > hy:
        rc = jax.lax.dynamic_update_slice(
            rc, jnp.zeros((hz, Syc - hy, Scx), rc.dtype), (0, hy, 0))
    return un, rc


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "smoother",
                                             "omega", "stencil"))
def prolong_smooth3(u, b, ec, n, sweeps, smoother="jacobi",
                    omega=2.0 / 3.0, stencil=None):
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    return _prolong_smooth3(u, b, ec, n=n, steps=steps, smoother=smoother,
                            omega=omega, stencil=stencil)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "smoother",
                                             "omega", "stencil"))
def prolong_smooth_resnorm3(u, b, ec, n, sweeps, smoother="jacobi",
                            omega=2.0 / 3.0, stencil=None):
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    return _prolong_smooth3(u, b, ec, n=n, steps=steps, smoother=smoother,
                            omega=omega, want_resnorm=True,
                            stencil=stencil)


# ---------------------------------------------------------------------------
# Distributed extended-block variants (dist.pallas_cycle3)
# ---------------------------------------------------------------------------

def supported_local3(shape, shape_c, steps: int, dtype,
                     ghost=(16, 16)) -> bool:
    """Whether the extended-block K1₃/K2₃ handle a local block pair.

    ``shape`` = (lz + 2*GZ, ly + 2*GY, Sx); owned extents must satisfy the
    same quanta as the global kernels (lz even, ly mult 16, Sx mult 128),
    with ghosts (GZ, GY) even / mult 16.
    """
    Rz, Ry, Sx = shape
    Rzc, Ryc, Scx = shape_c
    GZ, GY = ghost
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    # Local blocks keep the full (unsharded) lane axis; Sx = 128 is
    # allowed here (virtual-mesh tests) though the single-chip kernels
    # gate at 256.
    if Sx % 128 or Scx % 128 or Sx < 128 or 2 * Scx < Sx:
        return False
    if GZ % 2 or GY % 16 or Rz % 2 or Ry % 16:
        return False
    if steps + 2 > min(GZ, GY):
        return False
    if Rzc != Rz // 2 + GZ or Ryc != Ry // 2 + GY:
        return False
    if _tiles_k1(shape, steps + 2, dtype) is None:
        return False
    return True


def _prolong_smooth_local3(u, b, ec, origin, *, n, steps, smoother, omega,
                           ghost, want_resnorm=False):
    """K2₃ on a ghost-extended local block (dist.pallas_cycle3).

    ``ec`` is the coarse extended block (fine local l <-> coarse local
    l/2 + ghost/2); the coarse window for a fine window at (z0, y0) of
    size (WZ, WY) is (z0/2 + GZ/2, y0/2 + GY/2) of size (WZ/2, WY/2) —
    its prolongation covers the fine window exactly.  Output is valid on
    the owned region; ghost outputs are garbage (caller refreshes).
    With ``want_resnorm``, also returns this shard's owned ||b - A u'||²
    (psum across the mesh for the global norm).
    """
    Rz, Ry, Sx = u.shape
    Rzc, Ryc, Scx = ec.shape
    GZ, GY = ghost
    gz2, gy2 = GZ // 2, GY // 2
    dtype = u.dtype
    H = steps + (1 if want_resnorm else 0) + 1   # +1 prolong garbage ring
    TZ, HZ, TY, HY = _tiles_k1(u.shape, H, dtype)
    WZ, WY = TZ + 2 * HZ, TY + 2 * HY
    CHY, KWY = _core_y(TY, WY, steps)
    Wzc, Wyc = WZ // 2, WY // 2
    ntz = pl.cdiv(Rz, TZ)
    nty = pl.cdiv(Ry, TY)
    nt = ntz * nty
    Cx2 = 2 * Scx

    def kernel(org_smem, u_hbm, b_hbm, ec_hbm, out_u, out_ss,
               u_buf, b_buf, c_buf, ss_acc, in_sem, out_sem):
        def coords(t):
            tz = t // nty
            ty = t % nty
            z0 = jnp.clip(tz * TZ - HZ, 0, Rz - WZ)
            y0 = pl.multiple_of(jnp.clip(ty * TY - HY, 0, Ry - WY), 16)
            zo = jnp.clip(tz * TZ, 0, Rz - TZ)
            yo = pl.multiple_of(jnp.clip(ty * TY, 0, Ry - TY), 16)
            return z0, y0, zo, yo

        def in_dmas(slot, t):
            z0, y0, _, _ = coords(t)
            mc0 = z0 // 2 + gz2
            my0 = pl.multiple_of(y0 // 2 + gy2, 8)
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(z0, WZ), pl.ds(y0, WY)], u_buf.at[slot],
                    in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(z0, WZ), pl.ds(y0, WY)], b_buf.at[slot],
                    in_sem.at[slot, 1]),
                pltpu.make_async_copy(
                    ec_hbm.at[pl.ds(mc0, Wzc), pl.ds(my0, Wyc)],
                    c_buf.at[slot], in_sem.at[slot, 2]),
            )

        def out_dma(slot, t):
            z0, y0, zo, yo = coords(t)
            oz = zo - z0
            oy = pl.multiple_of(yo - y0, 16)
            return pltpu.make_async_copy(
                u_buf.at[slot, pl.ds(oz, TZ), pl.ds(oy, TY)],
                out_u.at[pl.ds(zo, TZ), pl.ds(yo, TY)],
                out_sem.at[slot])

        for d in in_dmas(0, 0):
            d.start()

        def body(t, carry):
            slot = t % 2
            nxt = 1 - slot

            @pl.when(t >= 1)
            def _():
                out_dma(nxt, t - 1).wait()

            @pl.when(t + 1 < nt)
            def _():
                for d in in_dmas(nxt, t + 1):
                    d.start()

            for d in in_dmas(slot, t):
                d.wait()

            z0, y0, _, yo = coords(t)
            interior, parity = _masks3(z0 + org_smem[0, 0],
                                       y0 + org_smem[0, 1], WZ, WY, Sx, n)
            corr = _prolong3_vmem(
                c_buf[slot].reshape(Wzc * Wyc, Scx), Wzc, Wyc)
            corr = corr.reshape(WZ, WY, Cx2)[:, :, :Sx]
            corr = corr.reshape(WZ * WY, Sx)
            state = jnp.where(interior,
                              u_buf[slot].reshape(WZ * WY, Sx) + corr,
                              jnp.zeros((), dtype))
            bwin = b_buf[slot].reshape(WZ * WY, Sx)
            if steps > 0 and KWY < WY:
                # Sweep chain on the y-core slice only (see _core_y).
                u_buf[slot] = state.reshape(WZ, WY, Sx)
                ky0 = pl.multiple_of(
                    jnp.clip((yo - y0) - CHY, 0, WY - KWY), 8)
                ik, pk = _masks3(z0 + org_smem[0, 0],
                                 y0 + ky0 + org_smem[0, 1], WZ, KWY, Sx, n)
                stepk = _step_fn3(smoother, omega, KWY)
                sk = u_buf[slot, :, pl.ds(ky0, KWY), :].reshape(
                    WZ * KWY, Sx)
                bk = b_buf[slot, :, pl.ds(ky0, KWY), :].reshape(
                    WZ * KWY, Sx)
                for j in range(steps):
                    sk = stepk(sk, bk, ik, pk, j)
                u_buf[slot, :, pl.ds(ky0, KWY), :] = sk.reshape(
                    WZ, KWY, Sx)
                state = u_buf[slot].reshape(WZ * WY, Sx)
            else:
                step = _step_fn3(smoother, omega, WY)
                for j in range(steps):
                    state = step(state, bwin, interior, parity, j)
                u_buf[slot] = state.reshape(WZ, WY, Sx)
            if want_resnorm:
                tz = t // nty
                ty = t % nty
                fr = jax.lax.broadcasted_iota(jnp.int32, (WZ * WY, Sx), 0)
                lz = z0 + fr // WY
                ly = y0 + fr % WY
                # owned-and-claimed local cells only (no ghost cells, no
                # clamp-overlap double counts)
                claim = (interior
                         & (lz >= jnp.maximum(tz * TZ, GZ))
                         & (lz < jnp.minimum((tz + 1) * TZ, Rz - GZ))
                         & (ly >= jnp.maximum(ty * TY, GY))
                         & (ly < jnp.minimum((ty + 1) * TY, Ry - GY)))
                r = jnp.where(claim,
                              _residual_of3(state, bwin, interior, WY),
                              jnp.zeros((), dtype)).astype(jnp.float32)
                ss_acc[0, 0] = ss_acc[0, 0] + jnp.sum(r * r)
            out_dma(slot, t).start()
            return carry

        ss_acc[0, 0] = jnp.float32(0.0)
        jax.lax.fori_loop(0, nt, body, 0)
        out_ss[0, 0] = ss_acc[0, 0]
        out_dma((nt - 1) % 2, nt - 1).wait()

    bytes_win = WZ * WY * _row_bytes(Sx, dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Rz, Ry, Sx), dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, Wzc, Wyc, Scx), dtype),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(11.5 * bytes_win) + 2 ** 21,
                                 127 * 2 ** 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WZ * WY * Sx * (10 * steps + 16)),
            bytes_accessed=int(Rz * Ry * Sx * 4 * 3.3),
            transcendentals=0,
        ),
    )(origin, u, b, ec)


@functools.partial(jax.jit, static_argnames=("n", "shape_c", "sweeps",
                                             "smoother", "omega", "ghost"))
def smooth_restrict_ext3(u, b, origin, n, shape_c, sweeps,
                         smoother="jacobi", omega=2.0 / 3.0,
                         ghost=(16, 16)):
    """K1₃ on a ghost-extended local block (inside shard_map).

    Returns (u', rc_ext): rc_ext is the next level's extended block with
    valid owned region (caller refreshes its ghosts).
    """
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    return _smooth_restrict3(u, b, n=n, shape_c=tuple(shape_c),
                             steps=steps, smoother=smoother, omega=omega,
                             origin=origin, ghost=ghost)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "smoother",
                                             "omega", "ghost",
                                             "want_resnorm"))
def prolong_smooth_ext3(u, b, ec, origin, n, sweeps, smoother="jacobi",
                        omega=2.0 / 3.0, ghost=(16, 16),
                        want_resnorm=False):
    """K2₃ on a ghost-extended local block (inside shard_map)."""
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    un, ss = _prolong_smooth_local3(u, b, ec, origin, n=n, steps=steps,
                                    smoother=smoother, omega=omega,
                                    ghost=ghost,
                                    want_resnorm=want_resnorm)
    if want_resnorm:
        return un, ss[0, 0]
    return un

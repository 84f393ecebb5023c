"""Fused 3D variable-coefficient V-cycle super-kernels (K1v₃ / K2v₃).

The 3D lift of ``kernels/vartransfer.py``: a variable-coefficient level
visit (7-point flux stencils, ``core.operators.VarStencilOp3D``) becomes
two kernel launches instead of the jnp path's ~12+ HBM passes of the cube
(smoother roll chains + XLA transfer lowering).

Coefficient streaming exploits the flux form aggressively:

* Only the THREE positive-direction transmissibility planes (tz, ty, tx)
  are streamed (plus the optional reaction plane ``c2*h²``); the
  minus-direction couplings ``t_*[z-1|y-1|x-1]`` are one-cell rolls on
  the fused in-VMEM window view, the diagonal is their six-term sum
  (+ c2), and ``1/diag`` is one guarded divide per window.  Garbage from
  the roll wraps lands only on the window edge ring — the same halo
  shrink region that absorbs the state-shift wraps (every window-plane
  y-edge coincides with the y-halo; see kernels/stencil3d.py).
  This is 3 (or 4) coefficient slab passes instead of the 8 a naive
  [diag, invd, tz±, ty±, tx±] layout would stream.
* ``VarStencilOp3D`` is flux-symmetric by construction (its ``_tm()``
  falls back to rolls of the stored planes), so this storage is exact —
  the nonsymmetric 3D family lives in ``Directional7Op`` and never
  reaches these kernels.

Transfers are the operator-independent machinery of
``kernels/transfer3d.py`` (separable blur + parity decimation; 2x
replication + averaging rolls), matching ``core.ops3d.restrict_fw3`` /
``prolong3`` bitwise on the interior.

Geometry is ``transfer3d``'s two-axis (z, y) tiling, but under a smaller
``VAR_WINDOW_BYTES`` budget: each tile holds 4 + C window slabs (u, b
double-buffered + C coefficient planes single-buffered) instead of 4.

Reference: the v2 operator-general design (``Multigrid_functions.cpp:
16-26``) — per-level CSR for arbitrary A — here as per-level flux planes
streamed through VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _roll
from .stencil3d import _row_bytes
from .transfer3d import (_blur3, _decimate3, _masks3, _prolong3_vmem,
                         _tiles_k1, _tiles_k2)

# Per-window VMEM target.  A K1v₃ tile holds 2u + 2b + C coef + 2 coarse
# windows plus Mosaic's compute temporaries for the roll/FMA chains, so
# the budget is ~half the constant-coefficient kernels' 10 MB.
VAR_WINDOW_BYTES = 5 * 2 ** 20
# Directional (6-plane) stacks hold two more slabs per tile than the
# 4-plane worst case; a smaller per-slab budget keeps the total VMEM
# bill (~18.5 windows + Mosaic temporaries) inside the 127 MB limit.
DIR_WINDOW_BYTES = 7 * 2 ** 19


def _var_budget(nplanes: int) -> int:
    return VAR_WINDOW_BYTES if nplanes <= 4 else DIR_WINDOW_BYTES


def supported_var3(shape, shape_c, steps: int, dtype,
                   nplanes: int = 3) -> bool:
    """Whether K1v₃/K2v₃ apply for a fine/coarse level pair.

    Same quanta as ``transfer3d.supported3`` (f32, lane-aligned x, y
    mult 16, even z) but under the var window budget.  ``nplanes``:
    3/4 flux-symmetric (``VarStencilOp3D``), 6 directional nonsymmetric
    (``Directional7Op`` variable-wind upwind).
    """
    Sz, Sy, Sx = shape
    Szc, Syc, Scx = shape_c
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if nplanes not in (3, 4, 6):
        return False
    if Sx % 128 or Scx % 128 or Sx < 256:
        return False
    if Sy % 16 or Syc % 8 or Sz % 2:
        return False
    if steps + 2 > 16:                      # y halo bound
        return False
    if 2 * Szc < Sz or 2 * Syc < Sy or 2 * Scx < Sx:
        return False
    budget = _var_budget(nplanes)
    if _tiles_k1(shape, steps + 2, dtype, budget=budget) is None:
        return False
    if _tiles_k2(shape, steps + 1, dtype, budget=budget) is None:
        return False
    return True


# ---------------------------------------------------------------------------
# In-window coefficient expansion (fused (WZ*WY, Sx) view)
# ---------------------------------------------------------------------------

def _expand_t3(c_buf, WZ: int, WY: int, Sx: int, dtype, edge0=None):
    """(C, WZ, WY, Sx) coefficient window -> (diag, invd, planes).

    ``planes`` is a tuple of (coef, shift, axis) triples such that the
    off-diagonal application is ``sum(coef * _roll(v, shift, axis))``
    (couplings are positive: A = D - sum).  Minus-direction planes are
    rolls of the stored ones; their wrap garbage lives on the window
    edge ring only (module docstring) — EXCEPT when a mixed-BC box keeps
    edge-0 unknowns: ``edge0 = (z0mask, y0mask, x0mask)`` (each an
    (R, Sx) bool or None) then zeroes the wrapped minus-plane values at
    global coordinate 0, which fixes both the derived diagonal and the
    off-diagonal application at those rows (the host operator's
    ``np.roll`` wraps onto zero padding there, mixedbc3d).
    """
    C = c_buf.shape[0]
    R = WZ * WY
    if C == 6:
        return _expand_dir3(c_buf, WZ, WY, Sx, dtype)
    tz = c_buf[0].reshape(R, Sx)
    ty = c_buf[1].reshape(R, Sx)
    tx = c_buf[2].reshape(R, Sx)
    tzm = _roll(tz, WY % R, 0)
    tym = _roll(ty, 1, 0)
    txm = _roll(tx, 1, 1)
    if edge0 is not None:
        zero = jnp.zeros((), dtype)
        mz, my, mx = edge0
        if mz is not None:
            tzm = jnp.where(mz, zero, tzm)
        if my is not None:
            tym = jnp.where(my, zero, tym)
        if mx is not None:
            txm = jnp.where(mx, zero, txm)
    diag = (tz + tzm) + (ty + tym) + (tx + txm)
    if C == 4:
        diag = diag + c_buf[3].reshape(R, Sx)
    nz = diag != 0.0
    invd = jnp.where(nz, 1.0 / jnp.where(nz, diag, jnp.ones((), dtype)),
                     jnp.zeros((), dtype))
    planes = ((tx, Sx - 1, 1), (txm, 1, 1),
              (ty, R - 1, 0), (tym, 1, 0),
              (tz, (R - WY) % R, 0), (tzm, WY % R, 0))
    return diag, invd, planes


def _expand_dir3(c_buf, WZ: int, WY: int, Sx: int, dtype):
    """(6, WZ, WY, Sx) directional window -> (diag, invd, planes).

    Nonsymmetric 7-point storage [cp_z, cp_y, cp_x, cm_z, cm_y, cm_x]
    (``Directional7Op``: cp couples a node to its +axis neighbor, cm to
    its -axis one; problems/convection3d.py).  Unlike the flux-symmetric
    layout NO coefficient plane is rolled — couplings are stored per
    row, so there is no wrap-garbage concern on the slabs — and the
    diagonal is the POINTWISE six-plane sum: upwind discretizations
    satisfy diag == sum(cp + cm) exactly (6·eps + h·sum|b|,
    ``convection_diffusion_op3``), so neither diag nor 1/diag is
    streamed.  Six slab passes instead of the naive eight.
    """
    R = WZ * WY
    cpz, cpy, cpx, cmz, cmy, cmx = (c_buf[k].reshape(R, Sx)
                                    for k in range(6))
    diag = (cpz + cmz) + (cpy + cmy) + (cpx + cmx)
    nz = diag != 0.0
    invd = jnp.where(nz, 1.0 / jnp.where(nz, diag, jnp.ones((), dtype)),
                     jnp.zeros((), dtype))
    planes = ((cpx, Sx - 1, 1), (cmx, 1, 1),
              (cpy, R - 1, 0), (cmy, 1, 0),
              (cpz, (R - WY) % R, 0), (cmz, WY % R, 0))
    return diag, invd, planes


def _edge0_masks(z0, y0, WZ, WY, Sx, box):
    """(z0mask, y0mask, x0mask) marking global coordinate 0 per axis, or
    None entries when the box excludes that edge (then plane wraps never
    reach live rows)."""
    if box is None or (box[0] != 0 and box[2] != 0 and box[4] != 0):
        return None
    fr = jax.lax.broadcasted_iota(jnp.int32, (WZ * WY, Sx), 0)
    mz = (z0 + fr // WY) == 0 if box[0] == 0 else None
    my = (y0 + fr % WY) == 0 if box[2] == 0 else None
    mx = None
    if box[4] == 0:
        mx = jax.lax.broadcasted_iota(jnp.int32, (WZ * WY, Sx), 1) == 0
    return mz, my, mx


def _offdiag3(planes, v):
    """sum of positive couplings: tz*v(z+1) + tzm*v(z-1) + ... ."""
    acc = None
    for coef, s, ax in planes:
        t = coef * _roll(v, s, ax)
        acc = t if acc is None else acc + t
    return acc


def _var_step3(state, bwin, invd, planes, interior, parity, j,
               smoother, omega, dtype):
    if smoother == "jacobi":
        w = omega[j % len(omega)] if isinstance(omega, tuple) else omega
        upd = ((1.0 - w) * state
               + w * invd * (bwin + _offdiag3(planes, state)))
        return jnp.where(interior, upd.astype(dtype), jnp.zeros((), dtype))
    # rbgs: half-sweep on color j % 2
    upd = invd * (bwin + _offdiag3(planes, state))
    color = interior & (parity == (j % 2))
    return jnp.where(color, upd.astype(dtype), state)


# ---------------------------------------------------------------------------
# K1v₃: var smooth + residual + FW restrict
# ---------------------------------------------------------------------------

def _var_smooth_restrict3(u, b, coef, *, n, shape_c, steps, smoother,
                          omega, origin=None, ghost=(0, 0), box=None,
                          cbox=None):
    """``origin``/``ghost``: distributed mode (dist.pallas_cycle3) — the
    same ghost-extended-block contract as ``transfer3d._smooth_restrict3``
    (masks in global coordinates via the (1, 2) int32 even ``origin``;
    coarse output lands at local l/2 + ghost/2)."""
    Sz, Sy, Sx = u.shape
    Szc, Syc, Scx = shape_c
    gz2, gy2 = ghost[0] // 2, ghost[1] // 2
    C = coef.shape[0]
    dtype = u.dtype
    H = steps + 2                    # +1 residual ring, +1 blur ring
    TZ, HZ, TY, HY = _tiles_k1(u.shape, H, dtype,
                               budget=_var_budget(C))
    WZ, WY = TZ + 2 * HZ, TY + 2 * HY
    ntz = pl.cdiv(Sz, TZ)
    nty = pl.cdiv(Sy, TY)
    nt = ntz * nty
    nc = n // 2
    Cx2 = Sx // 2

    def kernel(org_smem, u_hbm, b_hbm, c_hbm, out_u, out_rc, u_buf, b_buf,
               c_buf, rc_buf, in_sem, c_sem, out_sem):
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

        def coef_dma(t):
            z0, y0, _, _ = coords(t)
            return pltpu.make_async_copy(
                c_hbm.at[:, pl.ds(z0, WZ), pl.ds(y0, WY)], c_buf, c_sem)

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
        coef_dma(0).start()

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
            coef_dma(t).wait()

            z0, y0, _, _ = coords(t)
            interior, parity = _masks3(z0 + org_smem[0, 0],
                                       y0 + org_smem[0, 1], WZ, WY, Sx, n,
                                       box=box)
            e0 = _edge0_masks(z0 + org_smem[0, 0], y0 + org_smem[0, 1],
                              WZ, WY, Sx, box)
            diag, invd, planes = _expand_t3(c_buf, WZ, WY, Sx, dtype,
                                            edge0=e0)
            state = u_buf[slot].reshape(WZ * WY, Sx)
            bwin = b_buf[slot].reshape(WZ * WY, Sx)
            for j in range(steps):
                state = _var_step3(state, bwin, invd, planes, interior,
                                   parity, j, smoother, omega, dtype)
            u_buf[slot] = state.reshape(WZ, WY, Sx)
            r = bwin - diag * state + _offdiag3(planes, state)
            r = jnp.where(interior, r.astype(dtype), jnp.zeros((), dtype))
            rc = 0.5 * _decimate3(_blur3(r, WY, edge0=e0), WZ, WY)
            fr = jax.lax.broadcasted_iota(
                jnp.int32, (WZ // 2 * (WY // 2), Cx2), 0)
            gz = (z0 + org_smem[0, 0]) // 2 + fr // (WY // 2)
            gy = (y0 + org_smem[0, 1]) // 2 + fr % (WY // 2)
            gx = jax.lax.broadcasted_iota(
                jnp.int32, (WZ // 2 * (WY // 2), Cx2), 1)
            ci0, ci1, cj0, cj1, ck0, ck1 = cbox if cbox is not None else (
                1, nc - 1, 1, nc - 1, 1, nc - 1)
            cmask = ((gz >= ci0) & (gz <= ci1) & (gy >= cj0) & (gy <= cj1)
                     & (gx >= ck0) & (gx <= ck1))
            rc = jnp.where(cmask, rc, jnp.zeros((), dtype))
            if Scx > Cx2:                    # lane-pad to the coarse width
                rc = jnp.concatenate(
                    [rc, jnp.zeros((rc.shape[0], Scx - Cx2), dtype)], 1)
            rc_buf[slot] = rc.reshape(WZ // 2, WY // 2, Scx)

            for d in out_dmas(slot, t):
                d.start()
            # Coefficient slab is single-buffered: prefetch the next
            # tile's slab only after this tile's compute consumed it.
            @pl.when(t + 1 < nt)
            def _():
                coef_dma(t + 1).start()
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((C, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, WZ // 2, WY // 2, Scx), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int((12.5 + C) * bytes_win) + 2 ** 21,
                                 127 * 2 ** 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WZ * WY * Sx * (16 * steps + 30)),
            bytes_accessed=int(Sz * Sy * Sx * 4 * (3.3 + C)),
            transcendentals=0,
        ),
    )(origin, u, b, coef)


# ---------------------------------------------------------------------------
# K2v₃: prolong + correct + var smooth (+ optional fused resnorm)
# ---------------------------------------------------------------------------

def _var_prolong_smooth3(u, b, ec, coef, *, n, steps, smoother, omega,
                         want_resnorm=False, box=None):
    Sz, Sy, Sx = u.shape
    Szc, Syc, Scx = ec.shape
    C = coef.shape[0]
    dtype = u.dtype
    H = steps + (1 if want_resnorm else 0)
    TZ, TY, HZc, HYc = _tiles_k2(u.shape, H, dtype,
                                 budget=_var_budget(C))
    full_z, full_y = TZ == Sz, TY == Sy
    Wzc = Sz // 2 if full_z else TZ // 2 + 2 * HZc
    Wyc = Sy // 2 if full_y else TY // 2 + 2 * HYc
    WZ = Sz if full_z else 2 * Wzc
    WY = Sy if full_y else 2 * Wyc
    ntz = pl.cdiv(Sz, TZ)
    nty = pl.cdiv(Sy, TY)
    nt = ntz * nty
    Cx2 = 2 * Scx

    def kernel(u_hbm, b_hbm, ec_hbm, c_hbm, out_u, out_ss, u_buf, b_buf,
               e_buf, c_buf, ss_acc, in_sem, c_sem, out_sem):
        def coords(t):
            tz = t // nty
            ty = t % nty
            zo = jnp.clip(tz * TZ, 0, Sz - TZ)
            yo = pl.multiple_of(jnp.clip(ty * TY, 0, Sy - TY), 16)
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

        def _fine_origin(t):
            zo, yo, z0c, y0c = coords(t)
            zf0 = 2 * z0c if not full_z else 0
            yf0 = pl.multiple_of(2 * y0c, 16) if not full_y else 0
            return zf0, yf0

        def in_dmas(slot, t):
            _, _, z0c, y0c = coords(t)
            zf0, yf0 = _fine_origin(t)
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(zf0, WZ), pl.ds(yf0, WY)], u_buf.at[slot],
                    in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(zf0, WZ), pl.ds(yf0, WY)], b_buf.at[slot],
                    in_sem.at[slot, 1]),
                pltpu.make_async_copy(
                    ec_hbm.at[pl.ds(z0c, Wzc), pl.ds(y0c, Wyc)],
                    e_buf.at[slot], in_sem.at[slot, 2]),
            )

        def coef_dma(t):
            zf0, yf0 = _fine_origin(t)
            return pltpu.make_async_copy(
                c_hbm.at[:, pl.ds(zf0, WZ), pl.ds(yf0, WY)], c_buf, c_sem)

        def out_dma(slot, t):
            zo, yo, z0c, y0c = coords(t)
            zf0, yf0 = _fine_origin(t)
            oz = zo - zf0
            oy = pl.multiple_of(yo - yf0, 16)
            return pltpu.make_async_copy(
                u_buf.at[slot, pl.ds(oz, TZ), pl.ds(oy, TY)],
                out_u.at[pl.ds(zo, TZ), pl.ds(yo, TY)],
                out_sem.at[slot])

        for d in in_dmas(0, 0):
            d.start()
        coef_dma(0).start()

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
            coef_dma(t).wait()

            zf0, yf0 = _fine_origin(t)
            interior, parity = _masks3(zf0, yf0, WZ, WY, Sx, n, box=box)
            e0 = _edge0_masks(zf0, yf0, WZ, WY, Sx, box)
            diag, invd, planes = _expand_t3(c_buf, WZ, WY, Sx, dtype,
                                            edge0=e0)
            corr = _prolong3_vmem(
                e_buf[slot].reshape(Wzc * Wyc, Scx), Wzc, Wyc)
            corr = corr.reshape(2 * Wzc, 2 * Wyc, Cx2)[:WZ, :WY, :Sx]
            corr = corr.reshape(WZ * WY, Sx)
            state = jnp.where(interior,
                              u_buf[slot].reshape(WZ * WY, Sx) + corr,
                              jnp.zeros((), dtype))
            bwin = b_buf[slot].reshape(WZ * WY, Sx)
            for j in range(steps):
                state = _var_step3(state, bwin, invd, planes, interior,
                                   parity, j, smoother, omega, dtype)
            u_buf[slot] = state.reshape(WZ, WY, Sx)
            if want_resnorm:
                tz = t // nty
                ty = t % nty
                fr = jax.lax.broadcasted_iota(jnp.int32, (WZ * WY, Sx), 0)
                gz = zf0 + fr // WY
                gy = yf0 + fr % WY
                claim = (interior
                         & (gz >= tz * TZ) & (gz < (tz + 1) * TZ)
                         & (gy >= ty * TY) & (gy < (ty + 1) * TY))
                r = bwin - diag * state + _offdiag3(planes, state)
                r = jnp.where(claim, r,
                              jnp.zeros((), dtype)).astype(jnp.float32)
                ss_acc[0, 0] = ss_acc[0, 0] + jnp.sum(r * r)
            out_dma(slot, t).start()

            @pl.when(t + 1 < nt)
            def _():
                coef_dma(t + 1).start()
            return carry

        ss_acc[0, 0] = jnp.float32(0.0)
        jax.lax.fori_loop(0, nt, body, 0)
        if want_resnorm:
            out_ss[0, 0] = ss_acc[0, 0]
        out_dma((nt - 1) % 2, nt - 1).wait()

    out_shape = [jax.ShapeDtypeStruct((Sz, Sy, Sx), dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if want_resnorm:
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    kern = kernel if want_resnorm else (
        lambda u_hbm, b_hbm, ec_hbm, c_hbm, out_u, *scr: kernel(
            u_hbm, b_hbm, ec_hbm, c_hbm, out_u, None, *scr))

    bytes_win = WZ * WY * _row_bytes(Sx, dtype)
    result = pl.pallas_call(
        kern,
        out_shape=tuple(out_shape) if want_resnorm else out_shape[0],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=tuple(out_specs) if want_resnorm else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, Wzc, Wyc, Scx), dtype),
            pltpu.VMEM((C, WZ, WY, Sx), dtype),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int((13.5 + C) * bytes_win) + 2 ** 21,
                                 127 * 2 ** 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WZ * WY * Sx * (16 * steps + 24)),
            bytes_accessed=int(Sz * Sy * Sx * 4 * (3.3 + C)),
            transcendentals=0,
        ),
    )(u, b, ec, coef)
    if want_resnorm:
        u_out, ss = result
        return u_out, jnp.sqrt(ss[0, 0])
    return result


# ---------------------------------------------------------------------------
# Ghost-extended-block variants (dist.pallas_cycle3 var path)
# ---------------------------------------------------------------------------

def supported_local_var3(shape, shape_c, steps: int, dtype,
                         ghost=(16, 16), nplanes: int = 3) -> bool:
    """Whether the extended-block K1v₃/K2v₃ handle a local block pair.

    ``transfer3d.supported_local3``'s geometry quanta under the var
    window budget (the coefficient slab shares VMEM with u/b windows).
    """
    Rz, Ry, Sx = shape
    Rzc, Ryc, Scx = shape_c
    GZ, GY = ghost
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if nplanes not in (3, 4, 6):
        return False
    if Sx % 128 or Scx % 128 or Sx < 128 or 2 * Scx < Sx:
        return False
    if GZ % 2 or GY % 16 or Rz % 2 or Ry % 16:
        return False
    if steps + 2 > min(GZ, GY):
        return False
    if Rzc != Rz // 2 + GZ or Ryc != Ry // 2 + GY:
        return False
    if _tiles_k1(shape, steps + 2, dtype,
                 budget=_var_budget(nplanes)) is None:
        return False
    return True


def _var_prolong_smooth_local3(u, b, ec, coef, origin, *, n, steps,
                               smoother, omega, ghost,
                               want_resnorm=False):
    """K2v₃ on a ghost-extended local block (dist.pallas_cycle3 var path).

    Geometry follows ``transfer3d._prolong_smooth_local3`` (coarse window
    for a fine window at (z0, y0) sits at (z0/2 + GZ/2, y0/2 + GY/2));
    compute follows ``_var_prolong_smooth3`` (coefficient slab streamed
    per tile, minus-planes from in-window rolls).  Output is valid on the
    owned region; ghost outputs are garbage (caller refreshes).
    """
    Rz, Ry, Sx = u.shape
    Rzc, Ryc, Scx = ec.shape
    GZ, GY = ghost
    gz2, gy2 = GZ // 2, GY // 2
    C = coef.shape[0]
    dtype = u.dtype
    H = steps + (1 if want_resnorm else 0) + 1   # +1 prolong garbage ring
    TZ, HZ, TY, HY = _tiles_k1(u.shape, H, dtype, budget=_var_budget(C))
    WZ, WY = TZ + 2 * HZ, TY + 2 * HY
    Wzc, Wyc = WZ // 2, WY // 2
    ntz = pl.cdiv(Rz, TZ)
    nty = pl.cdiv(Ry, TY)
    nt = ntz * nty
    Cx2 = 2 * Scx

    def kernel(org_smem, u_hbm, b_hbm, ec_hbm, c_hbm, out_u, out_ss,
               u_buf, b_buf, e_buf, c_buf, ss_acc, in_sem, c_sem, out_sem):
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
                    e_buf.at[slot], in_sem.at[slot, 2]),
            )

        def coef_dma(t):
            z0, y0, _, _ = coords(t)
            return pltpu.make_async_copy(
                c_hbm.at[:, pl.ds(z0, WZ), pl.ds(y0, WY)], c_buf, c_sem)

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
        coef_dma(0).start()

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
            coef_dma(t).wait()

            z0, y0, _, _ = coords(t)
            interior, parity = _masks3(z0 + org_smem[0, 0],
                                       y0 + org_smem[0, 1], WZ, WY, Sx, n)
            diag, invd, planes = _expand_t3(c_buf, WZ, WY, Sx, dtype)
            corr = _prolong3_vmem(
                e_buf[slot].reshape(Wzc * Wyc, Scx), Wzc, Wyc)
            corr = corr.reshape(WZ, WY, Cx2)[:, :, :Sx]
            corr = corr.reshape(WZ * WY, Sx)
            state = jnp.where(interior,
                              u_buf[slot].reshape(WZ * WY, Sx) + corr,
                              jnp.zeros((), dtype))
            bwin = b_buf[slot].reshape(WZ * WY, Sx)
            for j in range(steps):
                state = _var_step3(state, bwin, invd, planes, interior,
                                   parity, j, smoother, omega, dtype)
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
                r = bwin - diag * state + _offdiag3(planes, state)
                r = jnp.where(claim, r,
                              jnp.zeros((), dtype)).astype(jnp.float32)
                ss_acc[0, 0] = ss_acc[0, 0] + jnp.sum(r * r)
            out_dma(slot, t).start()

            @pl.when(t + 1 < nt)
            def _():
                coef_dma(t + 1).start()
            return carry

        ss_acc[0, 0] = jnp.float32(0.0)
        jax.lax.fori_loop(0, nt, body, 0)
        out_ss[0, 0] = ss_acc[0, 0]
        out_dma((nt - 1) % 2, nt - 1).wait()

    bytes_win = WZ * WY * _row_bytes(Sx, dtype)
    if origin is None:
        origin = jnp.zeros((1, 2), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Rz, Ry, Sx), dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, Wzc, Wyc, Scx), dtype),
            pltpu.VMEM((C, WZ, WY, Sx), dtype),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int((13.5 + C) * bytes_win) + 2 ** 21,
                                 127 * 2 ** 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WZ * WY * Sx * (16 * steps + 24)),
            bytes_accessed=int(Rz * Ry * Sx * 4 * (3.3 + C)),
            transcendentals=0,
        ),
    )(origin, u, b, ec, coef)


@functools.partial(jax.jit, static_argnames=("n", "shape_c", "sweeps",
                                             "smoother", "omega", "ghost"))
def var_smooth_restrict_ext3(u, b, coef, origin, n, shape_c, sweeps,
                             smoother="jacobi", omega=2.0 / 3.0,
                             ghost=(16, 16)):
    """K1v₃ on a ghost-extended local block (inside shard_map).

    Returns (u', rc_ext): rc_ext is the next level's extended block with
    valid owned region (caller refreshes its ghosts)."""
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    om = omega if isinstance(omega, tuple) else float(omega)
    return _var_smooth_restrict3(u, b, coef, n=n, shape_c=tuple(shape_c),
                                 steps=steps, smoother=smoother, omega=om,
                                 origin=origin, ghost=ghost)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "smoother",
                                             "omega", "ghost",
                                             "want_resnorm"))
def var_prolong_smooth_ext3(u, b, ec, coef, origin, n, sweeps,
                            smoother="jacobi", omega=2.0 / 3.0,
                            ghost=(16, 16), want_resnorm=False):
    """K2v₃ on a ghost-extended local block (inside shard_map)."""
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    om = omega if isinstance(omega, tuple) else float(omega)
    un, ss = _var_prolong_smooth_local3(u, b, ec, coef, origin, n=n,
                                        steps=steps, smoother=smoother,
                                        omega=om, ghost=ghost,
                                        want_resnorm=want_resnorm)
    if want_resnorm:
        return un, ss[0, 0]
    return un


# ---------------------------------------------------------------------------
# Public jitted entry points
# ---------------------------------------------------------------------------

def _flat_coef3(op):
    """Operator -> (C, Sz, Sy, Sx) streaming planes.

    ``VarStencilOp3D``: [tz, ty, tx] (+ c2 when a reaction term is
    folded in).  ``Directional7Op`` (nonsymmetric variable-wind upwind):
    the (6, ...) [cp_z, cp_y, cp_x, cm_z, cm_y, cm_x] stack.  Uses the
    operator's setup-time ``coef_stack`` when present (uploaded with the
    hierarchy — no per-program restack; see kernels/varstencil.py::
    _flat_coef for the 2D precedent)."""
    st = getattr(op, "coef_stack", None)
    if st is not None:
        return jnp.asarray(st)
    if hasattr(op, "cp"):                  # Directional7Op, no stack
        return jnp.stack([jnp.asarray(a) for a in (*op.cp, *op.cm)])
    arrs = [op.tz, op.ty, op.tx]
    if op.c2 is not None:
        arrs.append(op.c2)
    return jnp.stack([jnp.asarray(a) for a in arrs])


@functools.partial(jax.jit, static_argnames=("n", "shape_c", "sweeps",
                                             "smoother", "omega", "box",
                                             "cbox"))
def var_smooth_restrict3(u, b, coef, n, shape_c, sweeps,
                         smoother="jacobi", omega=2.0 / 3.0, box=None,
                         cbox=None):
    """K1v₃: sweeps var smoothing steps + residual + FW restrict.
    ``box``/``cbox``: optional fine/coarse unknown boxes (mixed BCs)."""
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    om = omega if isinstance(omega, tuple) else float(omega)
    un, rc = _var_smooth_restrict3(u, b, coef, n=n, shape_c=tuple(shape_c),
                                   steps=steps, smoother=smoother, omega=om,
                                   box=box, cbox=cbox)
    # Zero the non-physical coarse tail beyond the tiled region (the same
    # invariant-restoring pass as transfer3d.smooth_restrict3).
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
                                             "omega", "box"))
def var_prolong_smooth3(u, b, ec, coef, n, sweeps, smoother="jacobi",
                        omega=2.0 / 3.0, box=None):
    """K2v₃: u <- var-smooth(u + P e_c, b, sweeps)."""
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    om = omega if isinstance(omega, tuple) else float(omega)
    return _var_prolong_smooth3(u, b, ec, coef, n=n, steps=steps,
                                smoother=smoother, omega=om, box=box)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "smoother",
                                             "omega", "box"))
def var_prolong_smooth_resnorm3(u, b, ec, coef, n, sweeps,
                                smoother="jacobi", omega=2.0 / 3.0,
                                box=None):
    """K2v₃ + fused post-smooth residual norm (until-tol driver)."""
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    om = omega if isinstance(omega, tuple) else float(omega)
    return _var_prolong_smooth3(u, b, ec, coef, n=n, steps=steps,
                                smoother=smoother, omega=om,
                                want_resnorm=True, box=box)

"""Fused 3D FAS super-kernels (K1f₃/K2f₃): the nonlinear level visit on
(Sz, Sy, Sx) lane-aligned grids as two streamed launches.

The 3D lift of ``kernels/fas.py`` over the geometry machinery of
``kernels/transfer3d.py`` (two-axis (z, y) tiling, fused-row compute,
in-VMEM parity transfers):

K1f₃ — nu1 nonlinear smoothing sweeps + nonlinear residual + solution
injection (even-even-even decimation) + the FAS coarse RHS
``bc = N_c(inject u) + FW(b - N(u))`` with the coarse operator evaluated
in-VMEM on the decimated half-window (plane stride WY/2) — the jnp
tier's separate coarse apply pass disappears, exactly as in 2D.

K2f₃ — trilinear prolong + correction add + nonlinear post-smoothing,
with an optional fused nonlinear residual norm.

Both nonlinear families ride the same harnesses through window-closure
factories (``wy -> step`` — the fused-row plane stride differs between
the full window and the y-core slice): pointwise Jacobi-Newton
(``PointwiseNonlinearOp`` over the 7-point stencil, diag 6) and
quasilinear Picard-Jacobi (``QuasilinearFluxOp3``, six edge coefficients
a(midpoint) recomputed in-VMEM per sweep).

Reference anchor: the V-cycle recursion being generalized
(``Poissons_SYCL.cpp:575-650``; strictly 2D and linear).  Gate:
``cycles.fas._use_fas_super_kernels`` via :func:`fas3_supported`
(= ``transfer3d.supported3``, f32, lane-aligned shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _roll
from .stencil3d import _nbr3, _row_bytes
from .transfer3d import (_blur3, _core_y, _decimate3, _masks3,
                         _prolong3_vmem, _tiles_k1, _tiles_k2, supported3)

__all__ = ["fas3_supported", "fas_smooth_restrict3", "fas_prolong_smooth3",
           "fas_prolong_smooth_resnorm3", "qfas_smooth_restrict3",
           "qfas_prolong_smooth3", "qfas_prolong_smooth_resnorm3"]


def fas3_supported(shape, shape_c, steps: int, dtype) -> bool:
    """Geometry gate: identical to the linear K1₃/K2₃ (the FAS payload's
    deepest read — coarse-stencil neighbors of the injection, fine reach
    steps+2 — matches the residual+blur reach)."""
    return supported3(shape, shape_c, steps, dtype)


# ---------------------------------------------------------------------------
# Window-closure factories (wy -> closure; fused-row plane stride)
# ---------------------------------------------------------------------------

def _jn_factories(omega: float, h2: float, diag: float, phi, dphi):
    """(step_factory, resid_factory, capply_factory) for the pointwise
    family, mirroring ``PointwiseNonlinearOp.nsmooth`` on the fused view."""
    h2c = 4.0 * h2

    def apply_of(state, interior, wy, hh):
        z = jnp.zeros((), state.dtype)
        return jnp.where(interior,
                         diag * state - _nbr3(state, wy)
                         + hh * phi(state).astype(state.dtype), z)

    def step_factory(wy):
        def step(state, bwin, interior, j):
            # dphi is phi (Bratu): one transcendental per step, not two.
            z = jnp.zeros((), state.dtype)
            pv = phi(state).astype(state.dtype)
            dv = pv if dphi is phi else dphi(state).astype(state.dtype)
            ap = jnp.where(interior,
                           diag * state - _nbr3(state, wy) + h2 * pv, z)
            denom = diag + h2 * dv
            upd = omega * (bwin - ap) / denom
            return jnp.where(interior, state + upd, z)
        return step

    def resid_factory(wy):
        def resid(state, bwin, interior):
            return jnp.where(interior, bwin - apply_of(state, interior,
                                                       wy, h2),
                             jnp.zeros((), state.dtype))
        return resid

    def capply_factory(wyc):
        def capply(uc0, cmask):
            return apply_of(uc0, cmask, wyc, h2c)
        return capply

    return step_factory, resid_factory, capply_factory


def _shift3k(x, d: int, ax: int, wy: int):
    """In-kernel twin of ``core.nonlinear._shift3`` on the fused
    (WZ*wy, Sx) row view: ax 0 = z (row stride wy), 1 = y, 2 = x."""
    R, C = x.shape
    if ax == 2:
        return _roll(x, (-d) % C, 1)
    stride = wy if ax == 0 else 1
    return _roll(x, (-d * stride) % R, 0)


_EDGES3 = tuple((d, ax) for ax in (0, 1, 2) for d in (1, -1))


def _edge_fluxes_diag3(state, a, wy: int):
    """(sum_e a(mid)(u - u_nbr), sum_e a(mid)) over the 6 edges, in the
    accumulation order of ``QuasilinearFluxOp3.apply``."""
    half = jnp.asarray(0.5, state.dtype)
    flux = jnp.zeros_like(state)
    diag = jnp.zeros_like(state)
    for d, ax in _EDGES3:
        un = _shift3k(state, d, ax, wy)
        ae = a(half * (state + un)).astype(state.dtype)
        flux = flux + ae * (state - un)
        diag = diag + ae
    return flux, diag


def _pq_factories3(omega: float, a):
    """Closure factories for the 3D quasilinear flux family (the flux
    form is h-independent, so the coarse apply is the same expression)."""
    def step_factory(wy):
        def step(state, bwin, interior, j):
            z = jnp.zeros((), state.dtype)
            flux, diag = _edge_fluxes_diag3(state, a, wy)
            ap = jnp.where(interior, flux, z)
            safe = jnp.where(diag > 0, diag, jnp.ones((), state.dtype))
            return jnp.where(interior,
                             state + omega * (bwin - ap) / safe, z)
        return step

    def resid_factory(wy):
        def resid(state, bwin, interior):
            z = jnp.zeros((), state.dtype)
            flux, _ = _edge_fluxes_diag3(state, a, wy)
            return jnp.where(interior,
                             bwin - jnp.where(interior, flux, z), z)
        return resid

    def capply_factory(wyc):
        def capply(uc0, cmask):
            z = jnp.zeros((), uc0.dtype)
            flux, _ = _edge_fluxes_diag3(uc0, a, wyc)
            return jnp.where(cmask, flux, z)
        return capply

    return step_factory, resid_factory, capply_factory


# ---------------------------------------------------------------------------
# K1f₃: smooth + nonlinear residual + injection + FAS coarse RHS
# ---------------------------------------------------------------------------

def _fas_smooth_restrict3(u, b, *, n, shape_c, steps, step_factory,
                          resid_factory, capply_factory, tps=2):
    """Returns (u', uc0, bc); ~3.9 HBM passes of the fine cube."""
    Sz, Sy, Sx = u.shape
    Szc, Syc, Scx = shape_c
    dtype = u.dtype
    H = steps + 2                            # residual + blur/coarse-nbr ring
    TZ, HZ, TY, HY = _tiles_k1(u.shape, H, dtype)
    WZ, WY = TZ + 2 * HZ, TY + 2 * HY
    # +1 ring over the linear K1₃: bc reads coarse-stencil neighbors of
    # the injection, one fine ring deeper than the blur aggregate.
    CHY, KWY = _core_y(TY, WY, steps + 1)
    ntz = pl.cdiv(Sz, TZ)
    nty = pl.cdiv(Sy, TY)
    nt = ntz * nty
    nc = n // 2
    Cx2 = Sx // 2

    def kernel(u_hbm, b_hbm, out_u, out_uc, out_bc, u_buf, b_buf,
               uc_buf, bc_buf, in_sem, out_sem):
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
            csrc_z = pl.ds(oz // 2, TZ // 2)
            csrc_y = pl.ds(pl.multiple_of(oy // 2, 8), TY // 2)
            cdst_z = pl.ds(zo // 2, TZ // 2)
            cdst_y = pl.ds(pl.multiple_of(yo // 2, 8), TY // 2)
            return (
                pltpu.make_async_copy(
                    u_buf.at[slot, pl.ds(oz, TZ), pl.ds(oy, TY)],
                    out_u.at[pl.ds(zo, TZ), pl.ds(yo, TY)],
                    out_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    uc_buf.at[slot, csrc_z, csrc_y],
                    out_uc.at[cdst_z, cdst_y], out_sem.at[slot, 1]),
                pltpu.make_async_copy(
                    bc_buf.at[slot, csrc_z, csrc_y],
                    out_bc.at[cdst_z, cdst_y], out_sem.at[slot, 2]),
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
                # Sweep chain on the y-core slice only (transfer3d._core_y;
                # the stale y-strips hold pre-smoothing state that never
                # reaches the output claims).
                ky0 = pl.multiple_of(
                    jnp.clip((yo - y0) - CHY, 0, WY - KWY), 8)
                ik, _ = _masks3(z0, y0 + ky0, WZ, KWY, Sx, n)
                stepk = step_factory(KWY)
                sk = u_buf[slot, :, pl.ds(ky0, KWY), :].reshape(
                    WZ * KWY, Sx)
                bk = b_buf[slot, :, pl.ds(ky0, KWY), :].reshape(
                    WZ * KWY, Sx)
                for j in range(steps):
                    sk = stepk(sk, bk, ik, j)
                u_buf[slot, :, pl.ds(ky0, KWY), :] = sk.reshape(
                    WZ, KWY, Sx)
                interior, _ = _masks3(z0, y0, WZ, WY, Sx, n)
                state = u_buf[slot].reshape(WZ * WY, Sx)
                bwin = b_buf[slot].reshape(WZ * WY, Sx)
            else:
                interior, _ = _masks3(z0, y0, WZ, WY, Sx, n)
                step = step_factory(WY)
                state = u_buf[slot].reshape(WZ * WY, Sx)
                bwin = b_buf[slot].reshape(WZ * WY, Sx)
                for j in range(steps):
                    state = step(state, bwin, interior, j)
                u_buf[slot] = state.reshape(WZ, WY, Sx)

            r = resid_factory(WY)(state, bwin, interior)
            rc = 0.5 * _decimate3(_blur3(r, WY), WZ, WY)
            # Injection: pure even-even-even decimation of the solution.
            uc0 = _decimate3(state, WZ, WY)
            # Coarse mask in global coarse coordinates.
            fr = jax.lax.broadcasted_iota(
                jnp.int32, (WZ // 2 * (WY // 2), Cx2), 0)
            gz = z0 // 2 + fr // (WY // 2)
            gy = y0 // 2 + fr % (WY // 2)
            gx = jax.lax.broadcasted_iota(
                jnp.int32, (WZ // 2 * (WY // 2), Cx2), 1)
            cmask = ((gz >= 1) & (gz <= nc - 1) & (gy >= 1) & (gy <= nc - 1)
                     & (gx >= 1) & (gx <= nc - 1))
            z = jnp.zeros((), dtype)
            uc0 = jnp.where(cmask, uc0, z)
            rc = jnp.where(cmask, rc, z)
            # FAS coarse RHS in-window (uc0's coarse neighbors live inside
            # the fine halo; plane stride on the decimated view is WY/2).
            bc = jnp.where(cmask,
                           capply_factory(WY // 2)(uc0, cmask) + rc, z)
            if Scx > Cx2:                    # lane-pad to the coarse width
                pad = jnp.zeros((uc0.shape[0], Scx - Cx2), dtype)
                uc0 = jnp.concatenate([uc0, pad], 1)
                bc = jnp.concatenate([bc, pad], 1)
            uc_buf[slot] = uc0.reshape(WZ // 2, WY // 2, Scx)
            bc_buf[slot] = bc.reshape(WZ // 2, WY // 2, Scx)

            for d in out_dmas(slot, t):
                d.start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    bytes_win = WZ * WY * _row_bytes(Sx, dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Sz, Sy, Sx), dtype),
                   jax.ShapeDtypeStruct((Szc, Syc, Scx), dtype),
                   jax.ShapeDtypeStruct((Szc, Syc, Scx), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 3,
        scratch_shapes=[
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, WZ, WY, Sx), dtype),
            pltpu.VMEM((2, WZ // 2, WY // 2, Scx), dtype),
            pltpu.VMEM((2, WZ // 2, WY // 2, Scx), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(11.0 * bytes_win) + 2 ** 21,
                                 127 * 2 ** 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WZ * WY * Sx * (14 * steps + 28)),
            bytes_accessed=int(Sz * Sy * Sx * 4 * 3.9),
            transcendentals=int(nt * WZ * WY * Sx * (tps * steps + 1)),
        ),
    )(u, b)


# ---------------------------------------------------------------------------
# K2f₃: prolong + add + nonlinear post-smooth (+ fused nl resnorm)
# ---------------------------------------------------------------------------

def _fas_prolong_smooth3(u, b, ec, *, n, steps, step_factory, resid_factory,
                         want_resnorm=False, tps=2):
    Sz, Sy, Sx = u.shape
    Szc, Syc, Scx = ec.shape
    dtype = u.dtype
    H = steps + (1 if want_resnorm else 0)
    TZ, TY, HZc, HYc = _tiles_k2(u.shape, H, dtype)
    full_z, full_y = TZ == Sz, TY == Sy
    Wzc = Sz // 2 if full_z else TZ // 2 + 2 * HZc
    Wyc = Sy // 2 if full_y else TY // 2 + 2 * HYc
    WZ = Sz if full_z else 2 * Wzc
    WY = Sy if full_y else 2 * Wyc
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
            interior, _ = _masks3(zf0, yf0, WZ, WY, Sx, n)
            corr = _prolong3_vmem(
                c_buf[slot].reshape(Wzc * Wyc, Scx), Wzc, Wyc)
            corr = corr.reshape(2 * Wzc, 2 * Wyc, Cx2)[:WZ, :WY, :Sx]
            corr = corr.reshape(WZ * WY, Sx)
            state = jnp.where(interior,
                              u_buf[slot].reshape(WZ * WY, Sx) + corr,
                              jnp.zeros((), dtype))
            bwin = b_buf[slot].reshape(WZ * WY, Sx)
            if steps > 0 and KWY < WY:
                u_buf[slot] = state.reshape(WZ, WY, Sx)
                ky0 = pl.multiple_of(
                    jnp.clip((yo - yf0) - CHY, 0, WY - KWY), 8)
                ik, _ = _masks3(zf0, yf0 + ky0, WZ, KWY, Sx, n)
                stepk = step_factory(KWY)
                sk = u_buf[slot, :, pl.ds(ky0, KWY), :].reshape(
                    WZ * KWY, Sx)
                bk = b_buf[slot, :, pl.ds(ky0, KWY), :].reshape(
                    WZ * KWY, Sx)
                for j in range(steps):
                    sk = stepk(sk, bk, ik, j)
                u_buf[slot, :, pl.ds(ky0, KWY), :] = sk.reshape(
                    WZ, KWY, Sx)
                state = u_buf[slot].reshape(WZ * WY, Sx)
            else:
                step = step_factory(WY)
                for j in range(steps):
                    state = step(state, bwin, interior, j)
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
                r = resid_factory(WY)(state, bwin,
                                      claim).astype(jnp.float32)
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
            vmem_limit_bytes=min(int(11.5 * bytes_win) + 2 ** 21,
                                 127 * 2 ** 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WZ * WY * Sx * (14 * steps + 20)),
            bytes_accessed=int(Sz * Sy * Sx * 4 * 3.3),
            transcendentals=int(nt * WZ * WY * Sx
                                * (tps * steps
                                   + (1 if want_resnorm else 0))),
        ),
    )(u, b, ec)
    if want_resnorm:
        u_out, ss = result
        return u_out, jnp.sqrt(ss[0, 0])
    return result


# ---------------------------------------------------------------------------
# Public jitted entry points
# ---------------------------------------------------------------------------

def _zero_tail3(a, shape_f):
    """Zero the non-physical coarse tail beyond (Sz/2, Sy/2) on the z/y
    axes (kernel tiles cover those ranges only); x is padded in-kernel."""
    Sz, Sy, _ = shape_f
    Szc, Syc, Scx = a.shape
    hz, hy = Sz // 2, Sy // 2
    if Szc > hz:
        a = jax.lax.dynamic_update_slice(
            a, jnp.zeros((Szc - hz, Syc, Scx), a.dtype), (hz, 0, 0))
    if Syc > hy:
        a = jax.lax.dynamic_update_slice(
            a, jnp.zeros((Szc, Syc - hy, Scx), a.dtype), (0, hy, 0))
    return a


@functools.partial(jax.jit, static_argnames=("n", "shape_c", "sweeps",
                                             "omega", "phi", "dphi", "h2",
                                             "diag"))
def fas_smooth_restrict3(u, b, n: int, shape_c, sweeps: int, omega: float,
                         phi, dphi, h2: float, diag: float = 6.0):
    """3D FAS K1f₃ (pointwise family)."""
    sf, rf, cf = _jn_factories(float(omega), float(h2), float(diag),
                               phi, dphi)
    un, uc0, bc = _fas_smooth_restrict3(
        u, b, n=n, shape_c=tuple(shape_c), steps=sweeps, step_factory=sf,
        resid_factory=rf, capply_factory=cf)
    return un, _zero_tail3(uc0, u.shape), _zero_tail3(bc, u.shape)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "omega", "phi",
                                             "dphi", "h2", "diag"))
def fas_prolong_smooth3(u, b, ec, n: int, sweeps: int, omega: float,
                        phi, dphi, h2: float, diag: float = 6.0):
    """3D FAS K2f₃ (pointwise family)."""
    sf, rf, _ = _jn_factories(float(omega), float(h2), float(diag),
                              phi, dphi)
    return _fas_prolong_smooth3(u, b, ec, n=n, steps=sweeps,
                                step_factory=sf, resid_factory=rf)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "omega", "phi",
                                             "dphi", "h2", "diag"))
def fas_prolong_smooth_resnorm3(u, b, ec, n: int, sweeps: int, omega: float,
                                phi, dphi, h2: float, diag: float = 6.0):
    """K2f₃ + fused nonlinear residual norm."""
    sf, rf, _ = _jn_factories(float(omega), float(h2), float(diag),
                              phi, dphi)
    return _fas_prolong_smooth3(u, b, ec, n=n, steps=sweeps,
                                step_factory=sf, resid_factory=rf,
                                want_resnorm=True)


@functools.partial(jax.jit, static_argnames=("n", "shape_c", "sweeps",
                                             "omega", "a"))
def qfas_smooth_restrict3(u, b, n: int, shape_c, sweeps: int, omega: float,
                          a):
    """3D quasilinear FAS K1f₃ (Picard-Jacobi windows)."""
    sf, rf, cf = _pq_factories3(float(omega), a)
    un, uc0, bc = _fas_smooth_restrict3(
        u, b, n=n, shape_c=tuple(shape_c), steps=sweeps, step_factory=sf,
        resid_factory=rf, capply_factory=cf, tps=6)
    return un, _zero_tail3(uc0, u.shape), _zero_tail3(bc, u.shape)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "omega", "a"))
def qfas_prolong_smooth3(u, b, ec, n: int, sweeps: int, omega: float, a):
    sf, rf, _ = _pq_factories3(float(omega), a)
    return _fas_prolong_smooth3(u, b, ec, n=n, steps=sweeps,
                                step_factory=sf, resid_factory=rf, tps=6)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "omega", "a"))
def qfas_prolong_smooth_resnorm3(u, b, ec, n: int, sweeps: int,
                                 omega: float, a):
    sf, rf, _ = _pq_factories3(float(omega), a)
    return _fas_prolong_smooth3(u, b, ec, n=n, steps=sweeps,
                                step_factory=sf, resid_factory=rf,
                                want_resnorm=True, tps=6)

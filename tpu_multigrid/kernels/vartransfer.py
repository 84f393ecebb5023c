"""Fused variable-coefficient V-cycle super-kernels (K1v / K2v).

The constant-coefficient super-kernels (kernels/transfer.py) cover a level
visit in two launches; variable-coefficient levels previously ran four
(var smooth+residual, standalone restrict, standalone prolong+add, var
smooth), paying two extra round-trips of the fine residual / correction
through HBM.  K1v and K2v fuse the (operator-independent) full-weighting
restriction and bilinear prolongation into the coefficient-streaming
smoother kernels of kernels/varstencil.py:

* **K1v** — ``steps`` var-stencil smoothing steps + residual + FW restrict:
  reads u, b and the 5 symmetric coefficient planes, writes u' and the
  coarse RHS.  The residual never touches HBM.
* **K2v** — bilinear prolong + correction add + ``steps`` smoothing steps
  (optionally + fused residual-norm): reads u, b, e_c and the planes,
  writes u'.

Geometry is the transfer-kernel one (row origins 16-aligned, column origins
256-aligned so coarse offsets stay on the (8, 128) f32 tiling); the
coefficient slab is single-buffered as in varstencil.py.  f32 only (the
var-coefficient path has no bf16 storage mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .transfer import (_bilinear_prolong, _fw_even2, _fw_zero_wrap, _geom,
                       _masks, _row_quanta)
from .varstencil import _expand, _low0_masks, _offdiag_apply


def supported(Sf: int, Sc: int, steps: int, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if Sf % 256 or Sc % 128:
        return False
    tr, tc, hr, hc = _geom(Sf, dtype)
    if hr and steps + 2 > hr:
        return False
    if hc and steps + 2 > hc:
        return False
    if 2 * Sc < Sf:
        return False
    return Sf >= 256


def _invd_of(diag, dtype):
    nz = diag != 0.0
    return jnp.where(nz, 1.0 / jnp.where(nz, diag, jnp.ones((), dtype)),
                     jnp.zeros((), dtype))


def _var_sweep(state, bwin, invd, planes, interior, parity, j,
               smoother, omega, dtype, low0=None):
    if smoother == "jacobi":
        w = omega[j % len(omega)] if isinstance(omega, tuple) else omega
        upd = ((1.0 - w) * state
               + w * invd * (bwin - _offdiag_apply(planes, state, low0)))
        return jnp.where(interior, upd.astype(dtype), jnp.zeros((), dtype))
    # rbgs: half-sweep on color j % 2
    upd = invd * (bwin - _offdiag_apply(planes, state, low0))
    color = interior & (parity == (j % 2))
    return jnp.where(color, upd.astype(dtype), state)


# ---------------------------------------------------------------------------
# K1v: var smooth + residual + FW restrict
# ---------------------------------------------------------------------------

def _var_smooth_restrict(u, b, coef, *, n, Sc, steps, smoother, omega,
                         box=None, cbox=None):
    S = u.shape[-1]
    dtype = u.dtype
    nplanes = coef.shape[0]
    rq, crq = _row_quanta(dtype)
    tr, tc, hr, hc = _geom(S, dtype)
    WFr, WFc = tr + 2 * hr, tc + 2 * hc
    nr = pl.cdiv(S, tr)
    ncols = pl.cdiv(S, tc)
    nt = nr * ncols
    nc_cells = n // 2

    def kernel(u_hbm, b_hbm, c_hbm, out_u, out_rc, u_buf, b_buf, c_buf,
               rc_buf, in_sem, c_sem, out_sem):
        def coords(t):
            ti = t // ncols
            tj = t % ncols
            ro = pl.multiple_of(jnp.clip(ti * tr, 0, S - tr), rq)
            co = pl.multiple_of(jnp.clip(tj * tc, 0, S - tc), 256)
            rf0 = pl.multiple_of(jnp.clip(ro - hr, 0, S - WFr), rq)
            cf0 = pl.multiple_of(jnp.clip(co - hc, 0, S - WFc), 256)
            return ro, co, rf0, cf0

        def in_dmas(slot, t):
            _, _, rf0, cf0 = coords(t)
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(rf0, WFr), pl.ds(cf0, WFc)],
                    u_buf.at[slot], in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(rf0, WFr), pl.ds(cf0, WFc)],
                    b_buf.at[slot], in_sem.at[slot, 1]),
            )

        def coef_dma(t):
            _, _, rf0, cf0 = coords(t)
            return pltpu.make_async_copy(
                c_hbm.at[:, pl.ds(rf0, WFr), pl.ds(cf0, WFc)], c_buf, c_sem)

        def out_dmas(slot, t):
            ro, co, rf0, cf0 = coords(t)
            off_r = pl.multiple_of(ro - rf0, rq)
            off_c = pl.multiple_of(co - cf0, 256)
            return (
                pltpu.make_async_copy(
                    u_buf.at[slot, pl.ds(off_r, tr), pl.ds(off_c, tc)],
                    out_u.at[pl.ds(ro, tr), pl.ds(co, tc)],
                    out_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    rc_buf.at[slot,
                              pl.ds(pl.multiple_of(off_r // 2, crq), tr // 2),
                              pl.ds(pl.multiple_of(off_c // 2, 128), tc // 2)],
                    out_rc.at[pl.ds(pl.multiple_of(ro // 2, crq), tr // 2),
                              pl.ds(pl.multiple_of(co // 2, 128), tc // 2)],
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

            _, _, rf0, cf0 = coords(t)
            interior, parity = _masks(rf0, cf0, WFr, WFc, n, box)
            diag, planes = _expand(c_buf, nplanes)
            low0 = _low0_masks(rf0, cf0, WFr, WFc, box)
            invd = _invd_of(diag, dtype)
            state = u_buf[slot]
            bwin = b_buf[slot]
            for j in range(steps):
                state = _var_sweep(state, bwin, invd, planes, interior,
                                   parity, j, smoother, omega, dtype, low0)
            u_buf[slot] = state
            r = bwin - diag * state - _offdiag_apply(planes, state, low0)
            r = jnp.where(interior, r.astype(dtype), jnp.zeros((), dtype))
            rc = _fw_even2(r, _fw_zero_wrap(rf0, cf0, WFr, WFc, box))
            ci0, ci1, cj0, cj1 = (cbox if cbox is not None
                                  else (1, nc_cells - 1, 1, nc_cells - 1))
            gi = (jax.lax.broadcasted_iota(jnp.int32, (WFr // 2, WFc // 2), 0)
                  + rf0 // 2)
            gj = (jax.lax.broadcasted_iota(jnp.int32, (WFr // 2, WFc // 2), 1)
                  + cf0 // 2)
            cmask = ((gi >= ci0) & (gi <= ci1)
                     & (gj >= cj0) & (gj <= cj1))
            rc_buf[slot] = jnp.where(cmask, rc, jnp.zeros((), dtype))

            for d in out_dmas(slot, t):
                d.start()

            @pl.when(t + 1 < nt)
            def _():
                coef_dma(t + 1).start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, S), dtype),
                   jax.ShapeDtypeStruct((Sc, Sc), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((nplanes, WFr, WFc), dtype),
            pltpu.VMEM((2, WFr // 2, WFc // 2), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WFr * WFc * (20 * max(steps, 1) + 36)),
            bytes_accessed=int(S * S * 4 * (7.5 + steps / 4)),
            transcendentals=0,
        ),
    )(u, b, coef)


# ---------------------------------------------------------------------------
# K2v: prolong + add + var smooth (+ fused residual norm)
# ---------------------------------------------------------------------------

def _var_prolong_smooth(u, b, ec, coef, *, n, steps, smoother, omega,
                        want_resnorm=False, box=None):
    S = u.shape[-1]
    dtype = u.dtype
    nplanes = coef.shape[0]
    rq, crq = _row_quanta(dtype)
    tr, tc, hr, hc = _geom(S, dtype, fam="k2")
    Wrc, Wcc = tr // 2 + hr, tc // 2 + hc
    WFr, WFc = 2 * Wrc, 2 * Wcc
    nr = pl.cdiv(S, tr)
    ncols = pl.cdiv(S, tc)
    nt = nr * ncols

    def kernel(u_hbm, b_hbm, ec_hbm, c_hbm, out_u, out_ss, u_buf, b_buf,
               e_buf, c_buf, ss_acc, in_sem, c_sem, out_sem):
        def coords(t):
            ti = t // ncols
            tj = t % ncols
            ro = pl.multiple_of(jnp.clip(ti * tr, 0, S - tr), rq)
            co = pl.multiple_of(jnp.clip(tj * tc, 0, S - tc), 256)
            r0c = pl.multiple_of(
                jnp.clip(ro // 2 - hr // 2, 0, (S - WFr) // 2), crq)
            c0c = pl.multiple_of(
                jnp.clip(co // 2 - hc // 2, 0, (S - WFc) // 2), 128)
            return ro, co, r0c, c0c

        def in_dmas(slot, t):
            _, _, r0c, c0c = coords(t)
            rf0 = pl.multiple_of(2 * r0c, rq)
            cf0 = pl.multiple_of(2 * c0c, 256)
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(rf0, WFr), pl.ds(cf0, WFc)],
                    u_buf.at[slot], in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(rf0, WFr), pl.ds(cf0, WFc)],
                    b_buf.at[slot], in_sem.at[slot, 1]),
                pltpu.make_async_copy(
                    ec_hbm.at[pl.ds(r0c, Wrc), pl.ds(c0c, Wcc)],
                    e_buf.at[slot], in_sem.at[slot, 2]),
            )

        def coef_dma(t):
            _, _, r0c, c0c = coords(t)
            rf0 = pl.multiple_of(2 * r0c, rq)
            cf0 = pl.multiple_of(2 * c0c, 256)
            return pltpu.make_async_copy(
                c_hbm.at[:, pl.ds(rf0, WFr), pl.ds(cf0, WFc)], c_buf, c_sem)

        def out_dma(slot, t):
            ro, co, r0c, c0c = coords(t)
            off_r = pl.multiple_of(ro - 2 * r0c, rq)
            off_c = pl.multiple_of(co - 2 * c0c, 256)
            return pltpu.make_async_copy(
                u_buf.at[slot, pl.ds(off_r, tr), pl.ds(off_c, tc)],
                out_u.at[pl.ds(ro, tr), pl.ds(co, tc)],
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

            _, _, r0c, c0c = coords(t)
            rf0, cf0 = 2 * r0c, 2 * c0c
            interior, parity = _masks(rf0, cf0, WFr, WFc, n, box)
            diag, planes = _expand(c_buf, nplanes)
            low0 = _low0_masks(rf0, cf0, WFr, WFc, box)
            invd = _invd_of(diag, dtype)
            corr = _bilinear_prolong(e_buf[slot])
            state = jnp.where(interior, u_buf[slot] + corr,
                              jnp.zeros((), dtype))
            bwin = b_buf[slot]
            for j in range(steps):
                state = _var_sweep(state, bwin, invd, planes, interior,
                                   parity, j, smoother, omega, dtype, low0)
            u_buf[slot] = state
            if want_resnorm:
                ti = t // ncols
                tj = t % ncols
                gi = (jax.lax.broadcasted_iota(jnp.int32, (WFr, WFc), 0)
                      + rf0)
                gj = (jax.lax.broadcasted_iota(jnp.int32, (WFr, WFc), 1)
                      + cf0)
                claim = (interior
                         & (gi >= ti * tr) & (gi < (ti + 1) * tr)
                         & (gj >= tj * tc) & (gj < (tj + 1) * tc))
                r = jnp.where(
                    claim,
                    bwin - diag * state - _offdiag_apply(planes, state,
                                                         low0),
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

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, S), dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((2, Wrc, Wcc), dtype),
            pltpu.VMEM((nplanes, WFr, WFc), dtype),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WFr * WFc * (20 * max(steps, 1) + 30)),
            bytes_accessed=int(S * S * 4 * (7.5 + steps / 4)),
            transcendentals=0,
        ),
    )(u, b, ec, coef)


# ---------------------------------------------------------------------------
# Public jitted entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("n", "Sc", "sweeps", "smoother", "omega",
                                    "box", "cbox"))
def var_smooth_restrict_fused(u, b, coef5, n: int, Sc: int, sweeps: int,
                              smoother: str = "jacobi",
                              omega=2.0 / 3.0, box=None, cbox=None):
    """K1v: sweeps var-stencil smoothing steps + residual + FW restrict.

    ``box``/``cbox``: optional inclusive fine/coarse unknown boxes
    (mixed-BC hierarchies; transfer._masks).
    """
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    om = omega if isinstance(omega, tuple) else float(omega)
    un, rc = _var_smooth_restrict(u, b, coef5, n=n, Sc=Sc, steps=steps,
                                  smoother=smoother, omega=om,
                                  box=box, cbox=cbox)
    S = u.shape[-1]
    half = S // 2
    if Sc > half:
        zr = jnp.zeros((Sc - half, Sc), un.dtype)
        zc = jnp.zeros((half, Sc - half), un.dtype)
        rc = jax.lax.dynamic_update_slice(rc, zr, (half, 0))
        rc = jax.lax.dynamic_update_slice(rc, zc, (0, half))
    return un, rc


@functools.partial(jax.jit,
                   static_argnames=("n", "sweeps", "smoother", "omega",
                                    "box"))
def var_prolong_smooth_fused(u, b, ec, coef5, n: int, sweeps: int,
                             smoother: str = "jacobi", omega=2.0 / 3.0,
                             box=None):
    """K2v: u <- var-smooth(u + P e_c, b, sweeps)."""
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    om = omega if isinstance(omega, tuple) else float(omega)
    un, _ = _var_prolong_smooth(u, b, ec, coef5, n=n, steps=steps,
                                smoother=smoother, omega=om, box=box)
    return un


@functools.partial(jax.jit,
                   static_argnames=("n", "sweeps", "smoother", "omega",
                                    "box"))
def var_prolong_smooth_resnorm(u, b, ec, coef5, n: int, sweeps: int,
                               smoother: str = "jacobi", omega=2.0 / 3.0,
                               box=None):
    """K2v + fused post-smooth residual norm (until-tol driver)."""
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    om = omega if isinstance(omega, tuple) else float(omega)
    un, ss = _var_prolong_smooth(u, b, ec, coef5, n=n, steps=steps,
                                 smoother=smoother, omega=om,
                                 want_resnorm=True, box=box)
    return un, jnp.sqrt(ss[0, 0])

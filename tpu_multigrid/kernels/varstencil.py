"""Fused Pallas smoother/residual for variable-coefficient 9-point stencils.

BASELINE config 4: variable-coefficient diffusion with per-node stencil
coefficient arrays (fine level: flux stencil; coarse levels: Galerkin
R A P 9-point operators).  Unlike the constant-coefficient kernels, every
tile must also stream the nine coefficient windows, so the op is
coefficient-bandwidth-bound (~11 HBM passes per k-sweep launch vs 3).  The
coefficient slab is single-buffered (9 windows don't fit twice in VMEM);
u/b stay double-buffered.

Geometry: outputs are fine-level only, so column offsets need only 128-lane
alignment (HC=128), unlike the transfer kernels' 256.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _roll

TR, TC = 128, 1024
HR, HC = 8, 128

# Offsets in row-major (3, 3) stencil order; index 4 is the diagonal.
_OFFSETS = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]


def supported(S: int, steps: int, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if S % 128:
        return False
    tr, tc, hr, hc = _geom(S)
    if hr and steps + 2 > hr:
        return False
    if hc and steps + 2 > hc:
        return False
    return S >= 256


def _geom(S: int):
    tr, hr = (TR, HR) if S >= TR + 2 * HR else (S, 0)
    tc, hc = (TC, HC) if S >= TC + 2 * HC else (S, 0)
    return tr, tc, hr, hc


def _shift(x, di, dj):
    """x[i+di, j+dj] with wrap (wrapped values land on masked cells)."""
    out = x
    r, c = x.shape
    if di:
        out = _roll(out, (-di) % r, 0)
    if dj:
        out = _roll(out, (-dj) % c, 1)
    return out


def _offdiag_apply(coefs, v):
    acc = jnp.zeros_like(v)
    for k, (di, dj) in enumerate(_OFFSETS):
        if di == 0 and dj == 0:
            continue
        acc = acc + coefs[k] * _shift(v, di, dj)
    return acc


def _var_streamed(u, b, coef, *, n, steps, smoother, omega, want_residual):
    S = u.shape[-1]
    dtype = u.dtype
    tr, tc, hr, hc = _geom(S)
    WR, WC = tr + 2 * hr, tc + 2 * hc
    nr = pl.cdiv(S, tr)
    ncols = pl.cdiv(S, tc)
    nt = nr * ncols

    def kernel(u_hbm, b_hbm, c_hbm, out_u, out_r_or_none,
               u_buf, b_buf, c_buf, in_sem, c_sem, out_sem):
        def coords(t):
            ti = t // ncols
            tj = t % ncols
            ro = pl.multiple_of(jnp.clip(ti * tr, 0, S - tr), 8)
            co = pl.multiple_of(jnp.clip(tj * tc, 0, S - tc), 128)
            r0 = pl.multiple_of(jnp.clip(ro - hr, 0, S - WR), 8)
            c0 = pl.multiple_of(jnp.clip(co - hc, 0, S - WC), 128)
            return ro, co, r0, c0

        def in_dmas(slot, t):
            _, _, r0, c0 = coords(t)
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(r0, WR), pl.ds(c0, WC)],
                    u_buf.at[slot], in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(r0, WR), pl.ds(c0, WC)],
                    b_buf.at[slot], in_sem.at[slot, 1]),
            )

        def coef_dma(t):
            _, _, r0, c0 = coords(t)
            return pltpu.make_async_copy(
                c_hbm.at[:, pl.ds(r0, WR), pl.ds(c0, WC)],
                c_buf, c_sem)

        def out_dmas(slot, t):
            ro, co, r0, c0 = coords(t)
            off_r = pl.multiple_of(ro - r0, 8)
            off_c = pl.multiple_of(co - c0, 128)
            dmas = [pltpu.make_async_copy(
                u_buf.at[slot, pl.ds(off_r, tr), pl.ds(off_c, tc)],
                out_u.at[pl.ds(ro, tr), pl.ds(co, tc)],
                out_sem.at[slot, 0])]
            if want_residual:
                dmas.append(pltpu.make_async_copy(
                    b_buf.at[slot, pl.ds(off_r, tr), pl.ds(off_c, tc)],
                    out_r_or_none.at[pl.ds(ro, tr), pl.ds(co, tc)],
                    out_sem.at[slot, 1]))
            return dmas

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

            _, _, r0, c0 = coords(t)
            gi = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 0) + r0
            gj = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 1) + c0
            interior = ((gi >= 1) & (gi <= n - 1)
                        & (gj >= 1) & (gj <= n - 1))
            parity = (gi + gj) % 2

            coefs = [c_buf[k] for k in range(9)]
            diag = coefs[4]
            invd = jnp.where(diag != 0.0, 1.0 / jnp.where(diag != 0.0, diag,
                                                          jnp.ones((), dtype)),
                             jnp.zeros((), dtype))
            state = u_buf[slot]
            bwin = b_buf[slot]
            for j in range(steps):
                if smoother == "jacobi":
                    w = (omega[j % len(omega)] if isinstance(omega, tuple)
                         else omega)
                    upd = ((1.0 - w) * state + w * invd
                           * (bwin - _offdiag_apply(coefs, state)))
                    state = jnp.where(interior, upd.astype(dtype),
                                      jnp.zeros((), dtype))
                else:  # rbgs half-sweep on color j % 2
                    upd = invd * (bwin - _offdiag_apply(coefs, state))
                    color = interior & (parity == (j % 2))
                    state = jnp.where(color, upd.astype(dtype), state)
            u_buf[slot] = state
            if want_residual:
                r = bwin - diag * state - _offdiag_apply(coefs, state)
                b_buf[slot] = jnp.where(interior, r.astype(dtype),
                                        jnp.zeros((), dtype))

            for d in out_dmas(slot, t):
                d.start()
            # Coefficient slab is single-buffered: prefetch the next tile's
            # slab only after this tile's compute consumed the current one.
            @pl.when(t + 1 < nt)
            def _():
                coef_dma(t + 1).start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    out_shape = [jax.ShapeDtypeStruct((S, S), dtype)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    if want_residual:
        out_shape.append(jax.ShapeDtypeStruct((S, S), dtype))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))

    kern = kernel if want_residual else (
        lambda u_hbm, b_hbm, c_hbm, out_u, *scr: kernel(
            u_hbm, b_hbm, c_hbm, out_u, None, *scr))

    return pl.pallas_call(
        kern,
        out_shape=tuple(out_shape) if want_residual else out_shape[0],
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=tuple(out_specs) if want_residual else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((2, WR, WC), dtype),
            pltpu.VMEM((2, WR, WC), dtype),
            pltpu.VMEM((9, WR, WC), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WR * WC * (20 * max(steps, 1) + 20)),
            bytes_accessed=int(S * S * 4 * (11 + steps / 4)),
            transcendentals=0,
        ),
    )(u, b, coef)


def _flat_coef(op):
    """(3, 3, S, S) -> (9, S, S) coefficient view (leading-dim reshape)."""
    c = op.coef
    return c.reshape((9,) + c.shape[-2:])


@functools.partial(jax.jit,
                   static_argnames=("n", "sweeps", "smoother", "omega"))
def var_smooth(u, b, coef9, n: int, sweeps: int, smoother: str = "jacobi",
               omega: float = 2.0 / 3.0):
    if sweeps <= 0:
        return u
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    return _var_streamed(u, b, coef9, n=n, steps=steps, smoother=smoother,
                         omega=omega if isinstance(omega, tuple) else float(omega),
                         want_residual=False)


@functools.partial(jax.jit,
                   static_argnames=("n", "sweeps", "smoother", "omega"))
def var_smooth_residual(u, b, coef9, n: int, sweeps: int,
                        smoother: str = "jacobi", omega: float = 2.0 / 3.0):
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    return _var_streamed(u, b, coef9, n=n, steps=steps, smoother=smoother,
                         omega=omega if isinstance(omega, tuple) else float(omega),
                         want_residual=True)

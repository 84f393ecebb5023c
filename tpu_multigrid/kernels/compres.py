"""Fused compensated-residual kernels for double-/triple-single iterates.

``precision.ds_residual`` / ``ts_residual`` as jnp expressions materialize
many full-size temporaries (compensated neighbor sums are 4 rolls + TwoSum
chains per component); at 16385^2 (1.1 GB per array) that exhausts HBM and
costs many passes.  These kernels stream the whole evaluation in one
launch: read b and the 2-3 iterate components, write r — 4-5 HBM passes,
VMEM-bounded, with identical TwoSum arithmetic (tested exactly against the
jnp versions in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _roll, _tile_sizes, MIN_SIZE


def supported(S: int, dtype) -> bool:
    return (jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            and S >= MIN_SIZE and S % 128 == 0)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _nbr_comp(x):
    """Neighbor sum with Neumaier compensation: (s, c), s + c exact."""
    wr, wc = x.shape
    terms = [_roll(x, 1, 0), _roll(x, wr - 1, 0),
             _roll(x, 1, 1), _roll(x, wc - 1, 1)]
    s = terms[0]
    c = jnp.zeros_like(x)
    for t in terms[1:]:
        s, e = _two_sum(s, t)
        c = c + e
    return s, c


def _nbr(x):
    wr, wc = x.shape
    return (_roll(x, 1, 0) + _roll(x, wr - 1, 0)
            + _roll(x, 1, 1) + _roll(x, wc - 1, 1))


def _ds_resid_window(b, uh, ul, interior):
    nbr_h, c_h = _nbr_comp(uh)
    s1, e1 = _two_sum(b, nbr_h)
    s2, e2 = _two_sum(s1, -4.0 * uh)
    a_lo = 4.0 * ul - _nbr(ul)
    s, c1 = _two_sum(s2, e1)
    s, c2 = _two_sum(s, e2)
    s, c3 = _two_sum(s, c_h)
    s, c4 = _two_sum(s, -a_lo)
    r = s + (c1 + (c2 + (c3 + c4)))
    return jnp.where(interior, r, jnp.zeros((), b.dtype))


def _ts_resid_window(b, uh, um, ul, interior):
    nbr_h, c_h = _nbr_comp(uh)
    nbr_m, c_m = _nbr_comp(um)
    s1, e1 = _two_sum(b, nbr_h)
    s2, e2 = _two_sum(s1, -4.0 * uh)
    s3, e3 = _two_sum(s2, nbr_m)
    s4, e4 = _two_sum(s3, -4.0 * um)
    a_l = 4.0 * ul - _nbr(ul)
    s, c1 = _two_sum(s4, e1)
    s, c2 = _two_sum(s, e2)
    s, c3 = _two_sum(s, e3)
    s, c4 = _two_sum(s, e4)
    s, c5 = _two_sum(s, c_h)
    s, c6 = _two_sum(s, c_m)
    s, c7 = _two_sum(s, -a_l)
    r = s + (c1 + (c2 + (c3 + (c4 + (c5 + (c6 + c7))))))
    return jnp.where(interior, r, jnp.zeros((), b.dtype))


def _comp_residual(arrays, *, n: int, window_fn):
    """Streamed multi-input residual: arrays[0] is b, the rest the iterate
    components; one output r."""
    S = arrays[0].shape[-1]
    dtype = arrays[0].dtype
    k = len(arrays)
    TRk, TCk, HR, HC = _tile_sizes(S, 1, dtype)
    WR, WC = TRk + 2 * HR, TCk + 2 * HC
    nr = pl.cdiv(S, TRk)
    ncols = pl.cdiv(S, TCk)
    nt = nr * ncols

    def kernel(*refs):
        ins = refs[:k]
        out_r = refs[k]
        bufs = refs[k + 1: 2 * k + 1]
        in_sem, out_sem = refs[2 * k + 1], refs[2 * k + 2]

        def coords(t):
            ti = t // ncols
            tj = t % ncols
            r0 = pl.multiple_of(jnp.clip(ti * TRk - HR, 0, S - WR), 8)
            c0 = pl.multiple_of(jnp.clip(tj * TCk - HC, 0, S - WC), 128)
            ro = pl.multiple_of(jnp.clip(ti * TRk, 0, S - TRk), 8)
            co = pl.multiple_of(jnp.clip(tj * TCk, 0, S - TCk), 128)
            return r0, c0, ro, co

        def in_dmas(slot, t):
            r0, c0, _, _ = coords(t)
            return [pltpu.make_async_copy(
                ins[i].at[pl.ds(r0, WR), pl.ds(c0, WC)],
                bufs[i].at[slot], in_sem.at[slot, i]) for i in range(k)]

        def out_dma(slot, t):
            r0, c0, ro, co = coords(t)
            off_r = pl.multiple_of(ro - r0, 8)
            off_c = pl.multiple_of(co - c0, 128)
            return pltpu.make_async_copy(
                bufs[0].at[slot, pl.ds(off_r, TRk), pl.ds(off_c, TCk)],
                out_r.at[pl.ds(ro, TRk), pl.ds(co, TCk)],
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

            r0, c0, _, _ = coords(t)
            gi = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 0) + r0
            gj = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 1) + c0
            interior = (gi >= 1) & (gi <= n - 1) & (gj >= 1) & (gj <= n - 1)
            wins = [bufs[i][slot] for i in range(k)]
            bufs[0][slot] = window_fn(*wins, interior)
            out_dma(slot, t).start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        out_dma((nt - 1) % 2, nt - 1).wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, S), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * k,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((2, WR, WC), dtype)] * k
        + [pltpu.SemaphoreType.DMA((2, k)),
           pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WR * WC * 40 * k),
            bytes_accessed=int(S * S * 4 * (k + 1)),
            transcendentals=0,
        ),
    )(*arrays)


@functools.partial(jax.jit, static_argnames=("n",))
def ds_residual_pallas(b, u_hi, u_lo, n: int):
    """r = b - A(u_hi + u_lo) to ~eps^2, one streamed launch (4 passes)."""
    return _comp_residual((b, u_hi, u_lo), n=n, window_fn=_ds_resid_window)


@functools.partial(jax.jit, static_argnames=("n",))
def ts_residual_pallas(b, u_hi, u_mid, u_lo, n: int):
    """r = b - A(u_hi + u_mid + u_lo) to ~eps^3, one launch (5 passes)."""
    return _comp_residual((b, u_hi, u_mid, u_lo), n=n,
                          window_fn=_ts_resid_window)

"""Compensated-refinement kernels on ghost-extended local blocks.

The distributed twins of ``kernels/compres.py`` (streamed ds/ts
compensated residuals) and ``kernels/transfer.py::prolong_comp_pallas``
(exact-pair bilinear prolongation), in the extended-block layout of
``kernels/local.py``: (R, C) = (lr + 2*GR, lc + 2*GC) blocks, full-width
row strips through VMEM, global origin passed via SMEM so one traced
program serves every shard position.

Needed because the jnp compensated expressions materialize many full-size
temporaries — at 16385^2-scale local blocks that exhausts HBM and costs
~7 passes where these kernels stream everything in one launch (the same
argument as ``compres.py``; CLAUDE.md r2 notes), and because the fused
distributed tier (``dist.refine_pallas``) must not fall back to XLA
strided scatters for the exact-pair prolongation.

Validity contract (same as kernels/local.py): inputs need fresh ghost
rings to the stated depth (1 for the residuals; GR/2 coarse rings for the
prolongation); outputs are exact on the owned region plus wherever enough
ghost depth existed, garbage elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compres import _ds_resid_window, _ts_resid_window
from .local import GR, GC, TR, HR
from .transfer import (_bilinear_prolong, _bilinear_prolong_comp)


# Strip-sizing budget for the double-buffered windows.  Deliberately far
# below the 128 MB program limit: the TwoSum cascades keep dozens of
# f32 temporaries live per element and Mosaic's register allocator
# SPILLS them to vmem — measured 80.9 MB of spill slots for a
# (272, 9728) ds_residual window (16385^2-scale runs OOM'd at
# 141-181 MB of 128 MB).  Spills scale with window area, so capping the
# buffer budget at ~32 MB leaves ~3x headroom for them; narrow grids
# still reach the TR=256 cap.
_VMEM_BUDGET = 32 * 1024 * 1024


def _strip_rows(C: int, nbufs: int, hr: int, quantum: int = 8,
                cap: int = TR) -> int:
    """Largest tr (multiple of ``quantum``, <= cap) such that ``nbufs``
    double-buffered (tr + 2*hr, C) f32 windows fit the VMEM budget.

    The compensated kernels carry up to 4 input buffers (ts) — full-width
    strips at 16385^2-single-column widths (C ~ 17k) only fit with
    shorter strips than kernels/local.py's TR = 256."""
    rows = _VMEM_BUDGET // (nbufs * 2 * C * 4)
    tr = max(quantum, (rows - 2 * hr) // quantum * quantum)
    return min(cap, tr)


def supported_local_ref(R: int, C: int, dtype) -> bool:
    """Extended-block compensated kernels: f32, local sizes on the
    (16, 256) quanta, strips fit VMEM (adaptive strip height)."""
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if (R - 2 * GR) <= 0 or (R - 2 * GR) % 16 or (C - 2 * GC) % 256:
        return False
    # ts residual: 4 buffers; prolong pair: 2 fine out buffers + the two
    # half-size coarse buffers (together ~1 fine window) = 3.
    return (_strip_rows(C, 4, 8) >= 8
            and _strip_rows(C, 3, HR, quantum=16) >= 16)


def _comp_residual_local(arrays, origin, *, n: int, window_fn):
    """Streamed compensated residual on extended blocks: arrays[0] is b,
    the rest the iterate components; one (R, C) output, owned-exact given
    1 fresh ghost ring on every input."""
    R, C = arrays[0].shape
    dtype = arrays[0].dtype
    k = len(arrays)
    # The residual windows only need a 1-ring halo; hr = 8 (the f32 row
    # offset quantum).  Strip height adapts to VMEM (k input buffers).
    cap = _strip_rows(C, k, 8)
    tr, hr = (cap, 8) if R >= cap + 16 else (R, 0)
    WR = tr + 2 * hr
    nt = pl.cdiv(R, tr)

    def kernel(*refs):
        org_smem = refs[0]
        ins = refs[1: 1 + k]
        out_r = refs[1 + k]
        bufs = refs[2 + k: 2 + 2 * k]
        in_sem, out_sem = refs[2 + 2 * k], refs[3 + 2 * k]

        def coords(t):
            r0 = pl.multiple_of(jnp.clip(t * tr - hr, 0, R - WR), 8)
            ro = pl.multiple_of(jnp.clip(t * tr, 0, R - tr), 8)
            return r0, ro

        def in_dmas(slot, t):
            r0, _ = coords(t)
            return [pltpu.make_async_copy(
                ins[i].at[pl.ds(r0, WR)], bufs[i].at[slot],
                in_sem.at[slot, i]) for i in range(k)]

        def out_dma(slot, t):
            r0, ro = coords(t)
            off = pl.multiple_of(ro - r0, 8)
            return pltpu.make_async_copy(
                bufs[0].at[slot, pl.ds(off, tr)],
                out_r.at[pl.ds(ro, tr)], out_sem.at[slot])

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

            r0, _ = coords(t)
            gi = (jax.lax.broadcasted_iota(jnp.int32, (WR, C), 0)
                  + r0 + org_smem[0, 0])
            gj = (jax.lax.broadcasted_iota(jnp.int32, (WR, C), 1)
                  + org_smem[0, 1])
            interior = (gi >= 1) & (gi <= n - 1) & (gj >= 1) & (gj <= n - 1)
            wins = [bufs[i][slot] for i in range(k)]
            bufs[0][slot] = window_fn(*wins, interior)
            out_dma(slot, t).start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        out_dma((nt - 1) % 2, nt - 1).wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec(memory_space=pl.ANY)] * k,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((2, WR, C), dtype)] * k
        + [pltpu.SemaphoreType.DMA((2, k)),
           pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WR * C * 40 * k),
            bytes_accessed=int(R * C * 4 * (k + 1)),
            transcendentals=0,
        ),
    )(origin, *arrays)


@functools.partial(jax.jit, static_argnames=("n",))
def ds_residual_ext(b, u_hi, u_lo, origin, n: int):
    """r = b - A(u_hi + u_lo) to ~eps^2 on an extended block (1 launch)."""
    return _comp_residual_local((b, u_hi, u_lo), origin, n=n,
                                window_fn=_ds_resid_window)


@functools.partial(jax.jit, static_argnames=("n",))
def ts_residual_ext(b, u_hi, u_mid, u_lo, origin, n: int):
    """r = b - A(u_hi + u_mid + u_lo) to ~eps^3 (1 launch)."""
    return _comp_residual_local((b, u_hi, u_mid, u_lo), origin, n=n,
                                window_fn=_ts_resid_window)


# ---------------------------------------------------------------------------
# Exact-pair bilinear prolongation: coarse ext pair -> fine ext pair
# ---------------------------------------------------------------------------

def _prolong_pair_local(ec_hi, ec_lo, origin, *, nf: int):
    """(p_hi, p_lo) with p_hi + p_lo == P ec_hi + P ec_lo exactly on the
    owned fine region: compensated prolongation of the hi part
    (``transfer._bilinear_prolong_comp``) plus plain prolongation of the
    lo part folded into p_lo.  Coarse ghosts must be fresh to depth
    (GR/2, GC/2) (the K2 contract).
    """
    Rc, Cc = ec_hi.shape
    dtype = ec_hi.dtype
    R, C = 2 * (Rc - GR), 2 * (Cc - GC)
    # 2 fine out-buffers + 2 half-size coarse in-buffers (~1 fine window
    # combined); fine offsets need 16-row quanta (coarse mapping).
    cap = _strip_rows(C, 3, HR, quantum=16)
    tr, hr = (cap, HR) if R >= cap + 2 * HR else (R, 0)
    WFr = tr + 2 * hr
    Wrc, Wcc = WFr // 2, C // 2
    nt = pl.cdiv(R, tr)

    def kernel(org_smem, hi_hbm, lo_hbm, out_hi, out_lo, hi_buf, lo_buf,
               ohi_buf, olo_buf, in_sem, out_sem):
        def coords(t):
            ro = pl.multiple_of(jnp.clip(t * tr, 0, R - tr), 16)
            rf0 = pl.multiple_of(jnp.clip(ro - hr, 0, R - WFr), 16)
            mc0 = pl.multiple_of(rf0 // 2 + GR // 2, 8)
            return ro, rf0, mc0

        def in_dmas(slot, t):
            _, _, mc0 = coords(t)
            return (
                pltpu.make_async_copy(
                    hi_hbm.at[pl.ds(mc0, Wrc), pl.ds(GC // 2, Wcc)],
                    hi_buf.at[slot], in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    lo_hbm.at[pl.ds(mc0, Wrc), pl.ds(GC // 2, Wcc)],
                    lo_buf.at[slot], in_sem.at[slot, 1]),
            )

        def out_dmas(slot, t):
            ro, rf0, _ = coords(t)
            off = pl.multiple_of(ro - rf0, 16)
            return (
                pltpu.make_async_copy(
                    ohi_buf.at[slot, pl.ds(off, tr)],
                    out_hi.at[pl.ds(ro, tr)], out_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    olo_buf.at[slot, pl.ds(off, tr)],
                    out_lo.at[pl.ds(ro, tr)], out_sem.at[slot, 1]),
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

            _, rf0, _ = coords(t)
            gi = (jax.lax.broadcasted_iota(jnp.int32, (WFr, C), 0)
                  + rf0 + org_smem[0, 0])
            gj = (jax.lax.broadcasted_iota(jnp.int32, (WFr, C), 1)
                  + org_smem[0, 1])
            interior = ((gi >= 1) & (gi <= nf - 1)
                        & (gj >= 1) & (gj <= nf - 1))
            zero = jnp.zeros((), dtype)
            hi, err = _bilinear_prolong_comp(hi_buf[slot])
            plo = _bilinear_prolong(lo_buf[slot]) + err
            ohi_buf[slot] = jnp.where(interior, hi, zero)
            olo_buf[slot] = jnp.where(interior, plo, zero)
            for d in out_dmas(slot, t):
                d.start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((R, C), dtype),
                   jax.ShapeDtypeStruct((R, C), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, Wrc, Wcc), dtype),
            pltpu.VMEM((2, Wrc, Wcc), dtype),
            pltpu.VMEM((2, WFr, C), dtype),
            pltpu.VMEM((2, WFr, C), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WFr * C * 30),
            bytes_accessed=int(R * C * 4 * 2.5),
            transcendentals=0,
        ),
    )(origin, ec_hi, ec_lo)


@functools.partial(jax.jit, static_argnames=("nf",))
def prolong_pair_ext(ec_hi, ec_lo, origin, nf: int):
    """Exact-pair bilinear prolongation on extended blocks."""
    return _prolong_pair_local(ec_hi, ec_lo, origin, nf=nf)


# ---------------------------------------------------------------------------
# Donated compensated add: comps (+)= y [, y2], renormalized, IN PLACE
# ---------------------------------------------------------------------------

def _divisor_strip(R: int, cap: int) -> int:
    """Largest strip height <= cap, multiple of 8, dividing R exactly.

    Exact division matters here (unlike the clamped-window kernels): the
    outputs ALIAS the inputs, so an overlapped tail strip would re-add
    the correction to rows the previous strip already updated."""
    t = min(cap, R) // 8 * 8
    while t > 8 and R % t:
        t -= 8
    return max(t, 8)


def _comp_add_local(comps, ys):
    """Streamed renormalized add on extended blocks, outputs donated.

    ``comps`` is the ds pair or ts triple; each y in ``ys`` (1 or 2 plain
    f32 arrays) is folded in via the same two-sum cascades as
    ``precision.ds_add``/``ts_add``.  ``input_output_aliases`` hands the
    component buffers to the outputs, so the update is in place on HBM —
    the jnp chain materializes 2*len(ys) fresh component sets per outer
    iteration, which at 16385^2 extended blocks (1.25 GB per array) is
    the difference between the ts iterate fitting the one chip or not.
    Pure elementwise: no halos, ghost regions compute garbage-in/
    garbage-out (refreshed by the caller as usual).
    """
    from ..precision import ds_add as _dsa, ts_add as _tsa

    k, m = len(comps), len(ys)
    arrays = (*comps, *ys)
    R, C = arrays[0].shape
    dtype = arrays[0].dtype
    tot = k + m
    tr = _divisor_strip(R, _strip_rows(C, tot, 0))
    nt = R // tr

    def kernel(*refs):
        ins = refs[:tot]
        outs = refs[tot: tot + k]
        bufs = refs[tot + k: 2 * tot + k]
        in_sem, out_sem = refs[2 * tot + k], refs[2 * tot + k + 1]

        def in_dmas(slot, t):
            return [pltpu.make_async_copy(
                ins[i].at[pl.ds(t * tr, tr)], bufs[i].at[slot],
                in_sem.at[slot, i]) for i in range(tot)]

        def out_dmas(slot, t):
            return [pltpu.make_async_copy(
                bufs[i].at[slot], outs[i].at[pl.ds(t * tr, tr)],
                out_sem.at[slot, i]) for i in range(k)]

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

            cs = tuple(bufs[i][slot] for i in range(k))
            for j in range(m):
                y = bufs[k + j][slot]
                cs = _dsa(*cs, y) if k == 2 else _tsa(*cs, y)
            for i in range(k):
                bufs[i][slot] = cs[i]
            for d in out_dmas(slot, t):
                d.start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    return pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((R, C), dtype)
                        for _ in range(k)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * tot,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * k),
        scratch_shapes=[pltpu.VMEM((2, tr, C), dtype)] * tot
        + [pltpu.SemaphoreType.DMA((2, tot)),
           pltpu.SemaphoreType.DMA((2, k))],
        input_output_aliases={i: i for i in range(k)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(R * C * 25 * k * m),
            bytes_accessed=int(R * C * 4 * (tot + k)),
            transcendentals=0,
        ),
    )(*arrays)


@jax.jit
def comp_add_ext(comps, ys):
    """comps (ds pair / ts triple) += sum(ys), renormalized, donated.

    One streamed launch replacing ``len(ys)`` chained jnp
    ``ds_add``/``ts_add`` calls and their fresh full-size outputs."""
    return _comp_add_local(tuple(comps), tuple(ys))

"""Fused Pallas zebra line relaxation (parallel cyclic reduction in VMEM).

The jnp zebra smoother (core.lines) is the textbook-robust anisotropic
remedy but the most expensive smoother on chip: each half-sweep runs
log2(S) full-array shift/FMA PCR steps, on BOTH row parities, every step
round-tripping HBM (measured 2.334 ms/V-cycle at 1025² vs ~0.5 ms for the
other jnp families — BENCH.md).  This kernel fuses a whole
``sweeps``-sweep zebra_x call into one launch:

- **Row-strip streaming**: windows span the full lane extent (lines run
  along x, so every tridiagonal system lives inside one window); tiles
  walk the rows with ghost-zone temporal blocking (one row of contamination
  per half-sweep), double-buffered u/b DMAs, single-buffered coefficients.
- **Parity decimation in sublane space**: a half-sweep updates only one
  row parity, so the PCR (and its identity embedding) runs on the
  ``(WR/2, S)`` decimated rows — half the VPU work the jnp path spends —
  via the standard parity-reshape trick (no strided ops; CLAUDE.md).
- **PCR along lanes**: ``pltpu.roll`` lane shifts with iota masks replace
  ``jnp.roll``; identical arithmetic to ``core.lines.tridiag_pcr`` (the
  suite checks parity against it in interpret mode).

Scope: ``zebra_x`` (lines along the lane axis) on the default Dirichlet
interior, f32.  ``zebra_y`` stays on the jnp path — its PCR shifts run
along sublanes, which would force full-height column windows whose VMEM
footprint doesn't fit at production sizes; problems with strong-y coupling
can transpose at setup (swap eps_x/eps_y) and use zebra_x.

Reference parity: the reference has no line smoother; this extends its v2
variable-coefficient design (``Multigrid_functions.cpp:16-26``) with the
anisotropic-robustness machinery at fused-kernel bandwidth.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _roll

# Total-VMEM target for the slab set.  The PCR step chain holds a large
# live set (d/dl/du/b plus up to 8 shifted arrays per step, on half-row
# slabs) on top of the u×2 + b×2 + coef×9 windows: Mosaic's measured
# stack need is ~30 slab-equivalents (a 20-slab estimate OOMed on
# hardware at S=2304: 62.5M scoped vs 41.4M limit).
ZEBRA_WINDOW_BYTES = 40 * 2 ** 20
_NSLAB = 34   # slab-count estimate: window set + PCR live registers


def _round_up(x: int, q: int) -> int:
    return -(-x // q) * q


def _rows_for(S: int, sweeps: int, dtype, budget: int):
    """(TR, HR): output rows per tile and row halo, or None if infeasible.

    Full-extent (TR=S, HR=0) when the whole grid fits the budget; otherwise
    row strips with HR = 2*sweeps contamination halo rounded to the
    8-sublane DMA quantum.
    """
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return None
    bytes_row = S * 4
    wr_max = budget // (_NSLAB * bytes_row)
    if wr_max >= S:
        return S, 0
    hr = max(8, _round_up(2 * sweeps, 8))
    wr = (wr_max // 8) * 8
    tr = wr - 2 * hr
    if tr < 8:
        return None
    return min(tr, 512), hr


def supported_zebra(S: int, sweeps: int, dtype,
                    budget: int = ZEBRA_WINDOW_BYTES) -> bool:
    """Whether the fused zebra_x kernel handles (S, sweeps, dtype)."""
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if S % 128 or S < 128 or S % 2:
        return False
    return _rows_for(S, sweeps, dtype, budget) is not None


def _pcr_lanes(dl, d, du, b, S: int):
    """Solve the lane-axis tridiagonal systems (identity-embedded rows).

    Same arithmetic as ``core.lines.tridiag_pcr`` with in-kernel rolls:
    ``shift(x, s)[j] = x[j+s]`` = ``_roll(x, (-s) % S, axis=1)``, wrapped
    entries replaced by the identity fill via a lane-iota mask.
    """
    steps = max(1, math.ceil(math.log2(S)))
    j = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    one = jnp.ones((), b.dtype)
    zero = jnp.zeros((), b.dtype)

    # Sequenced so every shifted temporary dies immediately after its one
    # use, and the two per-step out-of-range masks are shared across the
    # four shifts in each direction — Mosaic's stack allocator keeps the
    # whole unrolled chain's SSA values live otherwise (measured 37-62 MB
    # scoped-vmem stacks for the naive 8-temps-per-step form).
    for k in range(steps):
        s = 1 << k
        ok_m = j >= s          # x[j-s] in range
        ok_p = j < S - s       # x[j+s] in range

        def sh_m(x, fill):
            return jnp.where(ok_m, _roll(x, s, 1), fill)

        def sh_p(x, fill):
            return jnp.where(ok_p, _roll(x, S - s, 1), fill)

        alpha = -dl / sh_m(d, one)
        beta = -du / sh_p(d, one)
        d = d + alpha * sh_m(du, zero) + beta * sh_p(dl, zero)
        b = b + alpha * sh_m(b, zero) + beta * sh_p(b, zero)
        dl = alpha * sh_m(dl, zero)
        du = beta * sh_p(du, zero)
    return b / d


def _half_sweep_x(u, b, cp_all, r0, parity, n, S):
    """One zebra_x half-sweep on a (WR, S) window, updating ``parity`` rows.

    ``cp_all``: the 9 coefficient windows in row-major (3, 3) offset order
    (k ↔ (di, dj) = (k//3 - 1, k%3 - 1)); ``r0``: the window's global row
    origin (a multiple of 8, so local row parity == global row parity).
    """
    WR = u.shape[0]
    WRh = WR // 2
    dtype = u.dtype
    pairs = u.reshape(WRh, 2, S)
    even, odd = pairs[:, 0, :], pairs[:, 1, :]
    b_p = b.reshape(WRh, 2, S)[:, parity, :]
    cp = [c.reshape(WRh, 2, S)[:, parity, :] for c in cp_all]

    if parity == 1:
        # odd fine row 2i+1: row-1 = even[i], row+1 = even[i+1]
        north = even
        south = _roll(even, WRh - 1, 0)
        tgt = odd
    else:
        # even fine row 2i: row-1 = odd[i-1], row+1 = odd[i]
        north = _roll(odd, 1, 0)
        south = odd
        tgt = even

    rhs = b_p - (cp[0] * _roll(north, 1, 1) + cp[1] * north
                 + cp[2] * _roll(north, S - 1, 1)
                 + cp[6] * _roll(south, 1, 1) + cp[7] * south
                 + cp[8] * _roll(south, S - 1, 1))

    fi = jax.lax.broadcasted_iota(jnp.int32, (WRh, S), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (WRh, S), 1)
    gr = r0 + 2 * fi + parity
    inter = (gr >= 1) & (gr <= n - 1) & (gj >= 1) & (gj <= n - 1)
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    d = jnp.where(inter, cp[4], one)
    dl = jnp.where(inter, cp[3], zero)
    du = jnp.where(inter, cp[5], zero)
    rhs = jnp.where(inter, rhs, zero)
    sol = _pcr_lanes(dl, d, du, rhs, S)
    new_t = jnp.where(inter, sol.astype(dtype), tgt)

    if parity == 1:
        out = jnp.stack([even, new_t], axis=1)
    else:
        out = jnp.stack([new_t, odd], axis=1)
    return out.reshape(WR, S)


def _zebra_streamed(u, b, coef, *, n, sweeps, budget):
    S = u.shape[-1]
    dtype = u.dtype
    tr, hr = _rows_for(S, sweeps, dtype, budget)
    WR = tr + 2 * hr
    nt = pl.cdiv(S, tr)

    def kernel(u_hbm, b_hbm, c_hbm, out_u, u_buf, b_buf, c_buf,
               in_sem, c_sem, out_sem):
        def coords(t):
            ro = pl.multiple_of(jnp.clip(t * tr, 0, S - tr), 8)
            r0 = pl.multiple_of(jnp.clip(ro - hr, 0, S - WR), 8)
            return ro, r0

        def in_dmas(slot, t):
            _, r0 = coords(t)
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(r0, WR)], u_buf.at[slot],
                    in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(r0, WR)], b_buf.at[slot],
                    in_sem.at[slot, 1]),
            )

        def coef_dma(t):
            _, r0 = coords(t)
            return pltpu.make_async_copy(
                c_hbm.at[:, pl.ds(r0, WR)], c_buf, c_sem)

        def out_dma(slot, t):
            ro, r0 = coords(t)
            off_r = pl.multiple_of(ro - r0, 8)
            return pltpu.make_async_copy(
                u_buf.at[slot, pl.ds(off_r, tr)],
                out_u.at[pl.ds(ro, tr)], out_sem.at[slot])

        for dma in in_dmas(0, 0):
            dma.start()
        coef_dma(0).start()

        def body(t, carry):
            slot = t % 2
            nxt = 1 - slot

            @pl.when(t >= 1)
            def _():
                out_dma(nxt, t - 1).wait()

            @pl.when(t + 1 < nt)
            def _():
                for dma in in_dmas(nxt, t + 1):
                    dma.start()

            for dma in in_dmas(slot, t):
                dma.wait()
            coef_dma(t).wait()

            _, r0 = coords(t)
            cp_all = [c_buf[k] for k in range(9)]
            state = u_buf[slot]
            bwin = b_buf[slot]
            for _ in range(sweeps):
                state = _half_sweep_x(state, bwin, cp_all, r0, 1, n, S)
                state = _half_sweep_x(state, bwin, cp_all, r0, 0, n, S)
            u_buf[slot] = state

            out_dma(slot, t).start()

            @pl.when(t + 1 < nt)
            def _():
                coef_dma(t + 1).start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        out_dma((nt - 1) % 2, nt - 1).wait()

    bytes_win = WR * S * 4
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, S), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, WR, S), dtype),
            pltpu.VMEM((2, WR, S), dtype),
            pltpu.VMEM((9, WR, S), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # Flat high limit: the unrolled PCR chain's scoped-vmem stack
            # is allocator-dependent (measured 30+ slab-equivalents even
            # after the early-death sequencing); the budget-derived window
            # keeps the true working set small, the limit just needs to
            # clear Mosaic's conservative stack accounting.
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            # per half-sweep: ~log2(S) PCR steps of ~12 flops on half rows
            flops=int(2 * sweeps * nt * WR * S
                      * (6 * math.ceil(math.log2(S)) + 12)),
            bytes_accessed=int(S * S * 4 * 12),
            transcendentals=0,
        ),
    )(u, b, coef)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "budget"))
def zebra_sweeps_pallas(u, b, coef, n, sweeps,
                        budget: int = ZEBRA_WINDOW_BYTES):
    """``sweeps`` fused zebra_x sweeps (odd lines then even lines each).

    ``coef``: the operator's (9, S, S) row-major stencil planes
    (``op.coef.reshape(9, S, S)``).  Matches ``core.lines.zebra_sweeps``
    (axis=1) to f32 roundoff.
    """
    return _zebra_streamed(u, b, coef, n=n, sweeps=sweeps, budget=budget)


# ---------------------------------------------------------------------------
# Zebra super-kernels: K1z (zebra + residual + FW restrict) and
# K2z (bilinear prolong + add + zebra [+ fused residual norm])
# ---------------------------------------------------------------------------
#
# The standalone fused smoother above still leaves the anisotropic level
# visit at four launches and ~40 HBM plane passes (the jnp 9-point residual
# re-reads u plus all 9 coefficient planes the smoother just streamed).
# K1z/K2z extend the row-strip streaming with the K1v/K2v tails
# (kernels/vartransfer.py): the residual/restrict ride the coefficient
# windows already in VMEM, cutting a level visit to two launches and
# ~25 plane passes.  Same zebra_x / f32 / interior-Dirichlet scope.

_NSLAB_K1 = 36   # + rc half-slabs + residual temps over the smoother's 34
_NSLAB_K2 = 38   # + ec windows + prolong replication temps
_HR_FUSED = 16   # row halo: mult-16 so coarse offsets stay 8-aligned


def _rows_for_fused(S: int, sweeps: int, dtype, budget: int, nslab: int):
    """(TR, HR) with mult-16 tiles/halos (coarse DMA offsets need
    ``off_r // 2`` on the 8-sublane quantum), or None if infeasible."""
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return None
    bytes_row = S * 4
    wr_max = budget // (nslab * bytes_row)
    if wr_max >= S:
        return S, 0
    if 2 * sweeps + 2 > _HR_FUSED:
        return None
    wr = (wr_max // 16) * 16
    tr = wr - 2 * _HR_FUSED
    if tr < 16:
        return None
    return min(tr, 512), _HR_FUSED


def supported_zebra_fused(S: int, Sc: int, sweeps: int, dtype,
                          budget: int = ZEBRA_WINDOW_BYTES) -> bool:
    """Whether the fused zebra level-visit kernels handle the pair.

    ``S`` mult 256 (the restrict output's ``S/2`` lane extent must sit on
    the 128-lane DMA quantum) and ``Sc >= S/2 + 128`` (K2z streams one
    extra 128-lane coarse strip for the odd-column interpolants) — both
    hold for the standard ``round_up(n + 1, 256)`` hierarchy padding.
    """
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if S % 256 or S < 256 or Sc % 128:
        return False
    if Sc < S // 2 + 128:
        return False
    if _rows_for_fused(S, sweeps, dtype, budget, _NSLAB_K1) is None:
        return False
    return _rows_for_fused(S, sweeps, dtype, budget, _NSLAB_K2) is not None


def _residual9(u, b, cp, r0, n, S):
    """Interior-masked 9-point residual on a (WR, S) window.

    ``cp`` layout: k ↔ (di, dj) = (k//3 - 1, k%3 - 1) — the coefficient of
    ``u[i+di, j+dj]`` in row ``A u``.  Row-window wraps land on rows the
    caller never restricts (halo >= contamination + 2); the lane wraps land
    on interior-masked padding columns.
    """
    WR = u.shape[0]
    un = _roll(u, 1, 0)        # u[i-1, :]
    us = _roll(u, WR - 1, 0)   # u[i+1, :]

    def row_term(c_m, c_0, c_p, x):
        return (c_m * _roll(x, 1, 1) + c_0 * x
                + c_p * _roll(x, S - 1, 1))

    Au = (row_term(cp[0], cp[1], cp[2], un)
          + row_term(cp[3], cp[4], cp[5], u)
          + row_term(cp[6], cp[7], cp[8], us))
    gi = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0) + r0
    gj = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
    inter = (gi >= 1) & (gi <= n - 1) & (gj >= 1) & (gj <= n - 1)
    return jnp.where(inter, b - Au, jnp.zeros((), u.dtype))


def _zebra_smooth_restrict(u, b, coef, *, n, Sc, sweeps, budget):
    from .transfer import _fw_even2
    S = u.shape[-1]
    dtype = u.dtype
    tr, hr = _rows_for_fused(S, sweeps, dtype, budget, _NSLAB_K1)
    WR = tr + 2 * hr
    nt = pl.cdiv(S, tr)
    half = S // 2
    nc = n // 2

    def kernel(u_hbm, b_hbm, c_hbm, out_u, out_rc, u_buf, b_buf, c_buf,
               rc_buf, in_sem, c_sem, out_sem):
        def coords(t):
            ro = pl.multiple_of(jnp.clip(t * tr, 0, S - tr), 16)
            r0 = pl.multiple_of(jnp.clip(ro - hr, 0, S - WR), 16)
            return ro, r0

        def in_dmas(slot, t):
            _, r0 = coords(t)
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(r0, WR)], u_buf.at[slot],
                    in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(r0, WR)], b_buf.at[slot],
                    in_sem.at[slot, 1]),
            )

        def coef_dma(t):
            _, r0 = coords(t)
            return pltpu.make_async_copy(
                c_hbm.at[:, pl.ds(r0, WR)], c_buf, c_sem)

        def out_dmas(slot, t):
            ro, r0 = coords(t)
            off_r = pl.multiple_of(ro - r0, 16)
            return (
                pltpu.make_async_copy(
                    u_buf.at[slot, pl.ds(off_r, tr)],
                    out_u.at[pl.ds(ro, tr)], out_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    rc_buf.at[slot,
                              pl.ds(pl.multiple_of(off_r // 2, 8), tr // 2)],
                    out_rc.at[pl.ds(pl.multiple_of(ro // 2, 8), tr // 2),
                              pl.ds(0, half)],
                    out_sem.at[slot, 1]),
            )

        for dma in in_dmas(0, 0):
            dma.start()
        coef_dma(0).start()

        def body(t, carry):
            slot = t % 2
            nxt = 1 - slot

            @pl.when(t >= 1)
            def _():
                for dma in out_dmas(nxt, t - 1):
                    dma.wait()

            @pl.when(t + 1 < nt)
            def _():
                for dma in in_dmas(nxt, t + 1):
                    dma.start()

            for dma in in_dmas(slot, t):
                dma.wait()
            coef_dma(t).wait()

            _, r0 = coords(t)
            cp_all = [c_buf[k] for k in range(9)]
            state = u_buf[slot]
            bwin = b_buf[slot]
            for _ in range(sweeps):
                state = _half_sweep_x(state, bwin, cp_all, r0, 1, n, S)
                state = _half_sweep_x(state, bwin, cp_all, r0, 0, n, S)
            u_buf[slot] = state
            r = _residual9(state, bwin, cp_all, r0, n, S)
            rc = _fw_even2(r)
            gi = (jax.lax.broadcasted_iota(jnp.int32, (WR // 2, half), 0)
                  + r0 // 2)
            gj = jax.lax.broadcasted_iota(jnp.int32, (WR // 2, half), 1)
            cmask = (gi >= 1) & (gi <= nc - 1) & (gj >= 1) & (gj <= nc - 1)
            rc_buf[slot] = jnp.where(cmask, rc, jnp.zeros((), dtype))

            for dma in out_dmas(slot, t):
                dma.start()

            @pl.when(t + 1 < nt)
            def _():
                coef_dma(t + 1).start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for dma in out_dmas((nt - 1) % 2, nt - 1):
            dma.wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, S), dtype),
                   jax.ShapeDtypeStruct((Sc, Sc), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, WR, S), dtype),
            pltpu.VMEM((2, WR, S), dtype),
            pltpu.VMEM((9, WR, S), dtype),
            pltpu.VMEM((2, WR // 2, half), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WR * S
                      * (2 * sweeps * (6 * math.ceil(math.log2(S)) + 12)
                         + 30)),
            bytes_accessed=int(S * S * 4 * 13.25),
            transcendentals=0,
        ),
    )(u, b, coef)


def _prolong_zebra_smooth(u, b, ec, coef, *, n, sweeps, want_resnorm,
                          budget):
    from .transfer import _bilinear_prolong
    S = u.shape[-1]
    dtype = u.dtype
    tr, hr = _rows_for_fused(S, sweeps, dtype, budget, _NSLAB_K2)
    WR = tr + 2 * hr
    nt = pl.cdiv(S, tr)
    Wcc = S // 2 + 128

    def kernel(u_hbm, b_hbm, ec_hbm, c_hbm, out_u, out_ss, u_buf, b_buf,
               e_buf, c_buf, ss_acc, in_sem, c_sem, out_sem):
        def coords(t):
            ro = pl.multiple_of(jnp.clip(t * tr, 0, S - tr), 16)
            r0 = pl.multiple_of(jnp.clip(ro - hr, 0, S - WR), 16)
            return ro, r0

        def in_dmas(slot, t):
            _, r0 = coords(t)
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(r0, WR)], u_buf.at[slot],
                    in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(r0, WR)], b_buf.at[slot],
                    in_sem.at[slot, 1]),
                pltpu.make_async_copy(
                    ec_hbm.at[pl.ds(pl.multiple_of(r0 // 2, 8), WR // 2),
                              pl.ds(0, Wcc)],
                    e_buf.at[slot], in_sem.at[slot, 2]),
            )

        def coef_dma(t):
            _, r0 = coords(t)
            return pltpu.make_async_copy(
                c_hbm.at[:, pl.ds(r0, WR)], c_buf, c_sem)

        def out_dma(slot, t):
            ro, r0 = coords(t)
            off_r = pl.multiple_of(ro - r0, 16)
            return pltpu.make_async_copy(
                u_buf.at[slot, pl.ds(off_r, tr)],
                out_u.at[pl.ds(ro, tr)], out_sem.at[slot])

        for dma in in_dmas(0, 0):
            dma.start()
        coef_dma(0).start()

        def body(t, carry):
            slot = t % 2
            nxt = 1 - slot

            @pl.when(t >= 1)
            def _():
                out_dma(nxt, t - 1).wait()

            @pl.when(t + 1 < nt)
            def _():
                for dma in in_dmas(nxt, t + 1):
                    dma.start()

            for dma in in_dmas(slot, t):
                dma.wait()
            coef_dma(t).wait()

            ro, r0 = coords(t)
            cp_all = [c_buf[k] for k in range(9)]
            gi = jax.lax.broadcasted_iota(jnp.int32, (WR, S), 0) + r0
            gj = jax.lax.broadcasted_iota(jnp.int32, (WR, S), 1)
            inter = (gi >= 1) & (gi <= n - 1) & (gj >= 1) & (gj <= n - 1)
            corr = _bilinear_prolong(e_buf[slot])[:, :S]
            state = jnp.where(inter, u_buf[slot] + corr,
                              jnp.zeros((), dtype))
            bwin = b_buf[slot]
            for _ in range(sweeps):
                state = _half_sweep_x(state, bwin, cp_all, r0, 1, n, S)
                state = _half_sweep_x(state, bwin, cp_all, r0, 0, n, S)
            u_buf[slot] = state
            if want_resnorm:
                # Unclipped tile bounds: edge tiles overlap their clipped
                # windows, but each global row is claimed by exactly one t.
                claim = inter & (gi >= t * tr) & (gi < (t + 1) * tr)
                r = jnp.where(claim,
                              _residual9(state, bwin, cp_all, r0, n, S),
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
            pltpu.VMEM((2, WR, S), dtype),
            pltpu.VMEM((2, WR, S), dtype),
            pltpu.VMEM((2, WR // 2, Wcc), dtype),
            pltpu.VMEM((9, WR, S), dtype),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WR * S
                      * (2 * sweeps * (6 * math.ceil(math.log2(S)) + 12)
                         + 20)),
            bytes_accessed=int(S * S * 4 * 12.5),
            transcendentals=0,
        ),
    )(u, b, ec, coef)


@functools.partial(jax.jit,
                   static_argnames=("n", "Sc", "sweeps", "budget"))
def zebra_smooth_restrict(u, b, coef, n: int, Sc: int, sweeps: int,
                          budget: int = ZEBRA_WINDOW_BYTES):
    """K1z: ``sweeps`` zebra_x sweeps + 9-point residual + FW restrict.

    Returns ``(u', r_c)`` with ``r_c`` a (Sc, Sc) coarse grid (the region
    beyond ``S/2`` is explicit zero — per-level padding is independent)."""
    un, rc = _zebra_smooth_restrict(u, b, coef, n=n, Sc=Sc, sweeps=sweeps,
                                    budget=budget)
    S = u.shape[-1]
    half = S // 2
    if Sc > half:
        zr = jnp.zeros((Sc - half, Sc), un.dtype)
        zc = jnp.zeros((half, Sc - half), un.dtype)
        rc = jax.lax.dynamic_update_slice(rc, zr, (half, 0))
        rc = jax.lax.dynamic_update_slice(rc, zc, (0, half))
    return un, rc


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "budget"))
def prolong_zebra_smooth(u, b, ec, coef, n: int, sweeps: int,
                         budget: int = ZEBRA_WINDOW_BYTES):
    """K2z: u <- zebra-smooth(u + P e_c, b, sweeps)."""
    un, _ = _prolong_zebra_smooth(u, b, ec, coef, n=n, sweeps=sweeps,
                                  want_resnorm=False, budget=budget)
    return un


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "budget"))
def prolong_zebra_smooth_resnorm(u, b, ec, coef, n: int, sweeps: int,
                                 budget: int = ZEBRA_WINDOW_BYTES):
    """K2z + fused post-smooth residual norm (until-tol driver)."""
    un, ss = _prolong_zebra_smooth(u, b, ec, coef, n=n, sweeps=sweeps,
                                   want_resnorm=True, budget=budget)
    return un, jnp.sqrt(ss[0, 0])

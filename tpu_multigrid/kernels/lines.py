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

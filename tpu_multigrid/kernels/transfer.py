"""Fused V-cycle super-kernels: smooth+residual+restrict and
prolong+correct+smooth.

These two kernels cover an entire V-cycle level visit in ~6.5 HBM passes of
the fine grid (vs ~18.5 unfused — SURVEY.md §3.4 cost model), and eliminate
XLA:TPU's pathological strided-transfer lowering entirely (measured ~470 ms
per 8193^2 restrict+prolong round trip on a v5e chip vs ~3 ms here).

Grid-parity machinery (Mosaic supplies no strided vector ops):

* **row (sublane) deinterleave/interleave** — reshape the major dim:
  ``x.reshape(R//2, 2, C)[:, 0]`` and ``stack([a, b], 1).reshape(2R, C)``.
* **column (lane) parity** — transpose, do the row trick, transpose back.

Alignment: with ``S = round_up(n+1, 256)`` at every Pallas level (which for
``n = 2^l`` gives ``S_l = 2^l + 256``, so ``S_coarse = S_fine/2 + 128``
exactly), every DMA offset below is statically a multiple of the (8, 128)
tiling for f32 — including all edge clamps.  See kernels/stencil.py for the
streaming/double-buffering structure, shared here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import (_jacobi_step, _jacobi9_step, _nbr, _rbgs_step,
                      _rbgs9_step, _residual_of, _residual9_of, _roll)

# Fine-grid tile (TR, TC) with halos (HR, HC); all chosen so tile origins
# are multiples of (16, 256) and halos keep window origins on the same grid.
# When the grid is smaller than tile+halo along an axis, that axis falls
# back to full extent with no halo (the window covers the whole axis).
# HC must be a multiple of 256 (coarse-side offsets need lane alignment
# after halving), so the column-halo tax is amortized with a wide TC:
# (TC+2*HC)/TC = 1.22 at TC=2304 vs 1.5 at 1024.
TR, TC = 256, 2304
HR, HC = 16, 256
# Measured on-chip (r2): full-width strips (tc = S, hc = 0) are ~6% SLOWER
# at 8193^2 than TC=2304 column tiles despite 22% less traffic — the 4-way
# column split gives the double-buffered DMA pipeline finer granularity to
# overlap.  Keep the tiled scheme for wide grids.
#
# Per-(kernel, size) tile widths measured on a v5e chip (r2 A/B sweeps,
# benchmarks/bench_tc.py; same-session comparisons).  TC=2304 leaves
# clamp-overlap redundancy at the standard grid sizes (e.g. 4x2304 covers
# 8448 with 768 redundant columns); the measured optima below cut K1
# 22%/9% and K2 10%/13% at 8448/16640.  Unmeasured sizes keep the TC
# default.  "k1" = smooth_restrict-family geometry (tile + symmetric
# halo); "k2" = prolong_smooth-family (coarse-window-driven).
_TC_MEASURED = {
    ("k1", 8448): 4352, ("k2", 8448): 2816,
    ("k1", 16640): 8448, ("k2", 16640): 8448,
}


def _tc_for(S: int, fam: str) -> int:
    return _TC_MEASURED.get((fam, S), TC)


def _is_bf16(dtype) -> bool:
    return jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16)


def _row_quanta(dtype):
    """(fine-row, coarse-row) offset quanta.

    bf16's (16, 128) memref tiling needs fine-row offsets that stay
    16-multiples *after halving* onto the coarse grid, hence the 32/16
    pair (and the 32-deep row halo in :func:`_geom`); f32 uses 16/8.
    """
    return (32, 16) if _is_bf16(dtype) else (16, 8)


def _geom(S: int, dtype=jnp.float32, fam: str = "k1"):
    """Per-axis (tile, halo) adapted to the grid size, dtype, and kernel
    family (measured per-family tile widths, ``_TC_MEASURED``)."""
    hr_q = 32 if _is_bf16(dtype) else HR
    tc_t = _tc_for(S, fam)
    tr, hr = (TR, hr_q) if S >= TR + 2 * hr_q else (S, 0)
    tc, hc = (tc_t, HC) if S >= tc_t + 2 * HC else (S, 0)
    return tr, tc, hr, hc


def supported(Sf: int, Sc: int, steps: int, dtype) -> bool:
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    if Sf % 256 or Sc % 128:
        return False
    tr, tc, hr, hc = _geom(Sf, dtype)
    if hr and steps + 2 > hr:
        return False
    if hc and steps + 2 > hc:
        return False
    # Coarse array must cover half the fine array (K1 writes / K2 reads
    # coarse indices up to Sf/2).
    if 2 * Sc < Sf:
        return False
    return Sf >= 256


def _row_deinterleave(x):
    """(R, C) -> (R//2, C): keep even rows."""
    r, c = x.shape
    return x.reshape(r // 2, 2, c)[:, 0, :]


def _row_interleave(a, b):
    """(R, C), (R, C) -> (2R, C): rows a0 b0 a1 b1 ..."""
    r, c = a.shape
    return jnp.stack([a, b], axis=1).reshape(2 * r, c)


def _even2(x):
    """(R, C) -> (R//2, C//2): keep even rows and even cols."""
    xr = _row_deinterleave(x)
    return _row_deinterleave(xr.T).T


def _interleave2(ee, oe, eo, oo):
    """Four phase arrays (R, C) -> (2R, 2C) with out[2i+a, 2j+b]=phase[a][b]."""
    even_cols = _row_interleave(ee, oe)        # (2R, C): rows interleaved
    odd_cols = _row_interleave(eo, oo)         # (2R, C)
    return _row_interleave(even_cols.T, odd_cols.T).T  # interleave columns


def _fw_aggregate(r, zero_wrap=None):
    """Full-weighting aggregate (4r + 2*edges + corners)/4 at every node.

    ``zero_wrap``: optional ``(row0_mask, col0_mask)`` bool arrays marking
    cells whose global row / col index is 0.  The ``i-1``/``j-1`` rolls
    wrap at the array's first row/col; with the default Dirichlet interior
    the wrapped garbage lands on masked-out boundary rows, but boxes that
    keep edge-0 unknowns (Neumann sides, problems/mixedbc.py) need the
    wrapped term zeroed to match the jnp conv's zero padding.  Only the
    low edges need this — the high edges sit in interior zero padding.
    """
    R, C = r.shape
    up = _roll(r, 1, 0)                                   # r[i-1, j]
    if zero_wrap is not None and zero_wrap[0] is not None:
        up = jnp.where(zero_wrap[0], jnp.zeros((), r.dtype), up)
    row3 = up + 2.0 * r + _roll(r, R - 1, 0)
    lt = _roll(row3, 1, 1)                                # row3[i, j-1]
    if zero_wrap is not None and zero_wrap[1] is not None:
        lt = jnp.where(zero_wrap[1], jnp.zeros((), r.dtype), lt)
    return 0.25 * (lt + 2.0 * row3 + _roll(row3, C - 1, 1))


def _fw_even2(r, zero_wrap=None):
    """Full-weighting aggregate + even-even subsample, bf16-safe.

    Mosaic cannot shape-cast bf16 vectors (the parity reshapes fail with
    "unsupported shape cast"), so sub-32-bit inputs run the interleave
    machinery in f32 VMEM registers and cast back — DMA traffic stays in
    the narrow dtype, which is where the bf16 win lives.
    """
    if r.dtype != jnp.float32:
        return _even2(_fw_aggregate(r.astype(jnp.float32),
                                    zero_wrap)).astype(r.dtype)
    return _even2(_fw_aggregate(r, zero_wrap))


def _fw_zero_wrap(rf0, cf0, WR, WC, box):
    """(row0_mask, col0_mask) for :func:`_fw_aggregate`, or None entries
    when the box excludes the corresponding edge-0 unknowns."""
    if box is None or (box[0] != 0 and box[2] != 0):
        return None
    row0 = col0 = None
    if box[0] == 0:
        gi = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 0) + rf0
        row0 = gi == 0
    if box[2] == 0:
        gj = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 1) + cf0
        col0 = gj == 0
    return row0, col0


def _rep2_rows(a):
    """(R, C) -> (2R, C) with each row doubled: a0 a0 a1 a1 ..."""
    r, c = a.shape
    return jnp.broadcast_to(a[:, None, :], (r, 2, c)).reshape(2 * r, c)


def _repeat2x2(c):
    """(R, C) -> (2R, 2C), each element filling a 2x2 block."""
    rr = _rep2_rows(c)                   # (2R, C)
    return _rep2_rows(rr.T).T            # (2R, 2C)


def _bilinear_prolong(c):
    """(R, C) coarse -> (2R, 2C) fine bilinear interpolation.

    fine[2i,2j]=c[i,j]; fine[2i+1,2j]=(c[i,j]+c[i+1,j])/2; etc.  Formulated
    as nearest-neighbor 2x2 replication followed by two averaging rolls
    (with E = repeat2x2(c): F = (E + roll_up(E))/2 averages the odd rows,
    then the same on columns) — algebraically identical to interleaving the
    four phase averages but ~1.6x cheaper on the VPU (broadcast-reshape
    replication is cheap; the phase-interleave needed six transposes,
    bench_vpu2: 22.6 vs 35.4 us on a 144x2432 coarse window).  Wrap rows
    land outside the valid region, which the caller's masks zero.  bf16
    inputs compute in f32 (Mosaic cannot shape-cast bf16 vectors) and cast
    back.
    """
    if c.dtype != jnp.float32:
        return _bilinear_prolong(c.astype(jnp.float32)).astype(c.dtype)
    E = _repeat2x2(c)
    R2, C2 = E.shape
    F = 0.5 * (E + _roll(E, R2 - 1, 0))
    return 0.5 * (F + _roll(F, C2 - 1, 1))


def _step_fn(smoother, omega, stencil=None):
    """``stencil``: optional static 9-point weights (stencil[di+1][dj+1]
    multiplies u[i+di, j+dj]) replacing the hard-wired 5-point Poisson
    operator — zero extra HBM traffic (kernels/stencil.py)."""
    if smoother == "jacobi":
        om = omega if isinstance(omega, tuple) else float(omega)
        return _jacobi9_step(om, stencil) if stencil is not None \
            else _jacobi_step(om)
    elif smoother == "rbgs":
        return _rbgs9_step(stencil) if stencil is not None else _rbgs_step()
    raise ValueError(smoother)


def _resid_of(state, b, interior, stencil=None):
    if stencil is not None:
        return _residual9_of(state, b, interior, stencil)
    return _residual_of(state, b, interior)


# The 256-column / 16-row DMA halos exist for offset *alignment*; the
# smoothing steps only need steps+2 rings of halo semantically.  The step
# chain therefore runs on a CORE slice of the VMEM window — the output
# region plus an (8-row, 128-col) compute halo at dynamically-offset but
# tiling-aligned positions — cutting ~10-14% of per-step VPU work at the
# production geometries.  The residual/FW/prolong passes stay full-window:
# their outputs pin 256-alignment on the coarse side, and the stale strips
# they read (core-excluded cells hold pre-smoothing state) are >= CH-2
# cells away from anything the output DMAs copy.  Measured negative at
# tiny CH is roll wrap-around: contamination moves 1 ring per step, so the
# shrink is gated on steps + 2 <= CH.
def _core_geom(tr, tc, hr, hc, depth, dtype):
    """(CHr, CHc, row_quantum): compute-core halos for the step chain.

    ``depth``: ring-contamination depth of the in-core chain — ``steps``
    for direct smoothing, ``steps + 1`` for delta form (the defect
    evaluation is one more ring).  Falls back to the full DMA halos (no
    shrink) per axis when the depth exceeds the core halo's contamination
    budget or the axis has no halo (full-extent windows)."""
    q = 16 if _is_bf16(dtype) else 8
    chr_ = hr // 2 if (hr and depth + 2 <= hr // 2) else hr
    chc = 128 if (hc and depth + 2 <= 128) else hc
    return chr_, chc, q


def _core_offsets(off_r, off_c, CHr, CHc, WFr, WFc, KWr, KWc, q):
    """Aligned VMEM offsets of the compute core inside the DMA window."""
    kr0 = pl.multiple_of(jnp.clip(off_r - CHr, 0, WFr - KWr), q)
    kc0 = pl.multiple_of(jnp.clip(off_c - CHc, 0, WFc - KWc), 128)
    return kr0, kc0


def _masks(rf0, cf0, WR, WC, n, box=None):
    """(unknown-mask, parity) for a window at global origin (rf0, cf0).

    ``box``: optional static inclusive unknown box (i0, i1, j0, j1)
    replacing the default Dirichlet interior ``1..n-1`` — mixed-BC
    operators (problems/mixedbc.py) keep boundary rows as unknowns on the
    Neumann sides.  Values only; DMA geometry is box-independent.
    """
    i0, i1, j0, j1 = box if box is not None else (1, n - 1, 1, n - 1)
    gi = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 0) + rf0
    gj = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 1) + cf0
    inside = (gi >= i0) & (gi <= i1) & (gj >= j0) & (gj <= j1)
    return inside, (gi + gj) % 2


# ---------------------------------------------------------------------------
# K1: pre-smooth + residual + full-weighting restrict
# ---------------------------------------------------------------------------

def _delta_steps(uk, bk, ik, pk, steps, step, smooth_dtype):
    """Delta-form mixed-precision sweep chain on a window core.

    BASELINE config 3 (bf16 smoothing) in its numerically sound form
    (cycles._smooth, ROADMAP r2 #3): the f32 iterate never loses mantissa
    bits — compute the defect d = b - A u in f32, smooth e = 0 against d
    in ``smooth_dtype``, add e back in f32.  All HBM traffic and VMEM
    buffers stay f32; only the sweep-chain registers are narrow.  The
    defect adds one residual evaluation per window, so this exists for
    parity with the unfused delta path (and to measure whether narrow
    sweeps ever win on-chip), not as a projected speedup.
    """
    d = jnp.where(ik, bk - 4.0 * uk + _nbr(uk),
                  jnp.zeros((), uk.dtype)).astype(smooth_dtype)
    e = jnp.zeros_like(d)
    for j in range(steps):
        e = step(e, d, ik, pk, j)
    return jnp.where(ik, uk + e.astype(uk.dtype), jnp.zeros((), uk.dtype))


def _smooth_restrict(u, b, *, n, Sc, steps, smoother, omega,
                     smooth_dtype=None, stencil=None):
    """Returns (u', rc): u after ``steps`` smoothing steps, and the
    restricted residual on the (Sc, Sc) coarse grid.  ~3.3 HBM passes.

    ``smooth_dtype``: optional narrower dtype for the sweep chain
    (delta-form mixed precision, :func:`_delta_steps`).

    Replaces the reference's smooth -> residual-gemv-chain -> host-loop
    restriction sequence (``Poissons_SYCL.cpp:581,604-611``).
    """
    S = u.shape[-1]
    dtype = u.dtype
    rq, crq = _row_quanta(dtype)
    tr, tc, hr, hc = _geom(S, dtype)
    WFr, WFc = tr + 2 * hr, tc + 2 * hc
    delta = smooth_dtype is not None and smooth_dtype != dtype
    CHr, CHc, cq = _core_geom(tr, tc, hr, hc, steps + (1 if delta else 0),
                              dtype)
    KWr, KWc = tr + 2 * CHr, tc + 2 * CHc
    nr = pl.cdiv(S, tr)
    ncols = pl.cdiv(S, tc)
    nt = nr * ncols
    nc_cells = n // 2
    step = _step_fn(smoother, omega, stencil)

    def kernel(u_hbm, b_hbm, out_u, out_rc, u_buf, b_buf, rc_buf,
               in_sem, out_sem):
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

            ro, co, rf0, cf0 = coords(t)
            # Smoothing steps on the compute core only (output + small
            # aligned halo); residual/FW below read the full window, whose
            # core-excluded strips hold stale (pre-smoothing) state that
            # never reaches the output DMA regions.
            kr0, kc0 = _core_offsets(ro - rf0, co - cf0, CHr, CHc,
                                     WFr, WFc, KWr, KWc, cq)
            if steps > 0:
                ik, pk = _masks(rf0 + kr0, cf0 + kc0, KWr, KWc, n)
                state = u_buf[slot, pl.ds(kr0, KWr), pl.ds(kc0, KWc)]
                bk = b_buf[slot, pl.ds(kr0, KWr), pl.ds(kc0, KWc)]
                if smooth_dtype is not None and smooth_dtype != dtype:
                    state = _delta_steps(state, bk, ik, pk, steps, step,
                                         smooth_dtype)
                else:
                    for j in range(steps):
                        state = step(state, bk, ik, pk, j)
                u_buf[slot, pl.ds(kr0, KWr), pl.ds(kc0, KWc)] = state
            interior, _ = _masks(rf0, cf0, WFr, WFc, n)
            r = _resid_of(u_buf[slot], b_buf[slot], interior, stencil)
            # Full-weighting + even-even subsample; mask with coarse coords.
            rc = _fw_even2(r)
            gi = (jax.lax.broadcasted_iota(jnp.int32, (WFr // 2, WFc // 2), 0)
                  + rf0 // 2)
            gj = (jax.lax.broadcasted_iota(jnp.int32, (WFr // 2, WFc // 2), 1)
                  + cf0 // 2)
            cmask = ((gi >= 1) & (gi <= nc_cells - 1)
                     & (gj >= 1) & (gj <= nc_cells - 1))
            rc_buf[slot] = jnp.where(cmask, rc, jnp.zeros((), dtype))

            for d in out_dmas(slot, t):
                d.start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, S), dtype),
                   jax.ShapeDtypeStruct((Sc, Sc), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((2, WFr // 2, WFc // 2), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WFr * WFc * (8 * steps + 16)),
            bytes_accessed=int(S * S * 4 * 3.3),
            transcendentals=0,
        ),
    )(u, b)


# ---------------------------------------------------------------------------
# K2: prolong + add correction + post-smooth
# ---------------------------------------------------------------------------

def _prolong_smooth(u, b, ec, *, n, steps, smoother, omega,
                    want_resnorm=False, smooth_dtype=None, stencil=None):
    """u <- smooth(u + P e_c, b, steps).  ~3.3 HBM passes.

    Replaces the reference's host-loop ``interpolation2d`` + device
    ``vm::add`` + post-smoothing chain (``Poissons_SYCL.cpp:620-625``).

    ``want_resnorm``: additionally return the squared L2 norm of the
    post-smooth residual (a (1, 1) f32), accumulated tile-by-tile over each
    tile's disjoint claim region — this fuses the until-tol convergence
    check into the kernel, saving a separate residual+norm pass per cycle.
    """
    S = u.shape[-1]
    Sc = ec.shape[-1]
    dtype = u.dtype
    rq, crq = _row_quanta(dtype)
    tr, tc, hr, hc = _geom(S, dtype, fam="k2")
    # Coarse window: its 2x prolongation IS the fine working window.
    Wrc, Wcc = tr // 2 + hr, tc // 2 + hc          # fine window = (2Wrc, 2Wcc)
    WFr, WFc = 2 * Wrc, 2 * Wcc
    delta = smooth_dtype is not None and smooth_dtype != dtype
    CHr, CHc, cq = _core_geom(tr, tc, hr, hc, steps + (1 if delta else 0),
                              dtype)
    KWr, KWc = tr + 2 * CHr, tc + 2 * CHc
    nr = pl.cdiv(S, tr)
    ncols = pl.cdiv(S, tc)
    nt = nr * ncols
    step = _step_fn(smoother, omega, stencil)

    def kernel(u_hbm, b_hbm, ec_hbm, out_u, out_ss, u_buf, b_buf, c_buf,
               ss_acc, in_sem, out_sem):
        def coords(t):
            ti = t // ncols
            tj = t % ncols
            ro = pl.multiple_of(jnp.clip(ti * tr, 0, S - tr), rq)
            co = pl.multiple_of(jnp.clip(tj * tc, 0, S - tc), 256)
            # Coarse window origin; fine window origin is exactly 2x it and
            # must stay inside [0, S] (the upper bound (S - WFr)//2 also
            # keeps the coarse window inside Sc, since 2*Sc >= S).
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
                    c_buf.at[slot], in_sem.at[slot, 2]),
            )

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

            ro, co, r0c, c0c = coords(t)
            rf0, cf0 = 2 * r0c, 2 * c0c
            interior, _ = _masks(rf0, cf0, WFr, WFc, n)
            corr = _bilinear_prolong(c_buf[slot])
            u_buf[slot] = jnp.where(interior, u_buf[slot] + corr,
                                    jnp.zeros((), dtype))
            # Post-smoothing on the compute core only; core-excluded strips
            # keep the corrected-but-unsmoothed state, which neither the
            # output DMA nor the claim-masked resnorm region reads.
            kr0, kc0 = _core_offsets(ro - rf0, co - cf0, CHr, CHc,
                                     WFr, WFc, KWr, KWc, cq)
            if steps > 0:
                ik, pk = _masks(rf0 + kr0, cf0 + kc0, KWr, KWc, n)
                state = u_buf[slot, pl.ds(kr0, KWr), pl.ds(kc0, KWc)]
                bk = b_buf[slot, pl.ds(kr0, KWr), pl.ds(kc0, KWc)]
                if smooth_dtype is not None and smooth_dtype != dtype:
                    state = _delta_steps(state, bk, ik, pk, steps, step,
                                         smooth_dtype)
                else:
                    for j in range(steps):
                        state = step(state, bk, ik, pk, j)
                u_buf[slot, pl.ds(kr0, KWr), pl.ds(kc0, KWc)] = state
            if want_resnorm:
                # Accumulate ||b - A u||^2 over this tile's disjoint claim
                # region (unclamped bounds, so edge-overlap regions are not
                # double-counted).
                ti = t // ncols
                tj = t % ncols
                state = u_buf[slot]
                bwin = b_buf[slot]
                gi = (jax.lax.broadcasted_iota(jnp.int32, (WFr, WFc), 0)
                      + rf0)
                gj = (jax.lax.broadcasted_iota(jnp.int32, (WFr, WFc), 1)
                      + cf0)
                claim = (interior
                         & (gi >= ti * tr) & (gi < (ti + 1) * tr)
                         & (gj >= tj * tc) & (gj < (tj + 1) * tc))
                r = _resid_of(state, bwin, claim,
                              stencil).astype(jnp.float32)
                ss_acc[0, 0] = ss_acc[0, 0] + jnp.sum(r * r)
            out_dma(slot, t).start()
            return carry

        ss_acc[0, 0] = jnp.float32(0.0)
        jax.lax.fori_loop(0, nt, body, 0)
        out_ss[0, 0] = ss_acc[0, 0]
        out_dma((nt - 1) % 2, nt - 1).wait()

    out_shape = (jax.ShapeDtypeStruct((S, S), dtype),
                 jax.ShapeDtypeStruct((1, 1), jnp.float32))
    out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pltpu.SMEM))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((2, Wrc, Wcc), dtype),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WFr * WFc * (8 * steps + 12)),
            bytes_accessed=int(S * S * 4 * 3.3),
            transcendentals=0,
        ),
    )(u, b, ec)


# ---------------------------------------------------------------------------
# Public jitted entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("n", "Sc", "sweeps", "smoother", "omega",
                                    "smooth_dtype", "stencil"))
def smooth_restrict(u, b, n: int, Sc: int, sweeps: int,
                    smoother: str = "jacobi", omega: float = 2.0 / 3.0,
                    smooth_dtype=None, stencil=None):
    """sweeps pre-smoothing sweeps, then residual + FW restriction.

    ``smooth_dtype``: optional narrower sweep-chain dtype (delta form).
    ``stencil``: optional static 9-point weights (constant compact
    operators, e.g. Mehrstellen) replacing the 5-point Poisson stencil."""
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    un, rc = _smooth_restrict(u, b, n=n, Sc=Sc, steps=steps,
                              smoother=smoother, omega=omega,
                              smooth_dtype=smooth_dtype, stencil=stencil)
    # The kernel's tile grid covers coarse indices [0, S/2); zero the
    # remaining (non-physical) tail so the zero-outside-interior invariant
    # holds for downstream ops.
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
                                    "smooth_dtype", "stencil"))
def prolong_smooth(u, b, ec, n: int, sweeps: int,
                   smoother: str = "jacobi", omega: float = 2.0 / 3.0,
                   smooth_dtype=None, stencil=None):
    """u <- smooth(u + P e_c, b) with `sweeps` post-smoothing sweeps."""
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    un, _ = _prolong_smooth(u, b, ec, n=n, steps=steps,
                            smoother=smoother, omega=omega,
                            smooth_dtype=smooth_dtype, stencil=stencil)
    return un


@functools.partial(jax.jit,
                   static_argnames=("n", "sweeps", "smoother", "omega",
                                    "smooth_dtype", "stencil"))
def prolong_smooth_resnorm(u, b, ec, n: int, sweeps: int,
                           smoother: str = "jacobi",
                           omega: float = 2.0 / 3.0, smooth_dtype=None,
                           stencil=None):
    """Like :func:`prolong_smooth` but also returns ||b - A u'||_2, fusing
    the until-tol convergence check into the kernel (zero extra HBM
    traffic vs a separate residual + norm pass)."""
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    un, ss = _prolong_smooth(u, b, ec, n=n, steps=steps,
                             smoother=smoother, omega=omega,
                             want_resnorm=True, smooth_dtype=smooth_dtype,
                             stencil=stencil)
    return un, jnp.sqrt(ss[0, 0])


# ---------------------------------------------------------------------------
# Standalone transfer kernels (operator-independent)
# ---------------------------------------------------------------------------
#
# Used where the fused super-kernels don't apply: variable-coefficient
# levels (the smoother/residual runs elsewhere, but the transfers must
# still avoid XLA's pathological strided lowering), FMG's upward solution
# interpolation, and injection/P1 experiments.

def _restrict_only(r, *, n, Sc, cbox=None):
    """rc = FW-restrict(r): one streamed pass (read r, write rc)."""
    S = r.shape[-1]
    dtype = r.dtype
    rq, crq = _row_quanta(dtype)
    tr, tc, hr, hc = _geom(S, dtype)
    WFr, WFc = tr + 2 * hr, tc + 2 * hc
    nr = pl.cdiv(S, tr)
    ncols = pl.cdiv(S, tc)
    nt = nr * ncols
    nc_cells = n // 2

    def kernel(r_hbm, out_rc, r_buf, rc_buf, in_sem, out_sem):
        def coords(t):
            ti = t // ncols
            tj = t % ncols
            ro = pl.multiple_of(jnp.clip(ti * tr, 0, S - tr), rq)
            co = pl.multiple_of(jnp.clip(tj * tc, 0, S - tc), 256)
            rf0 = pl.multiple_of(jnp.clip(ro - hr, 0, S - WFr), rq)
            cf0 = pl.multiple_of(jnp.clip(co - hc, 0, S - WFc), 256)
            return ro, co, rf0, cf0

        def in_dma(slot, t):
            _, _, rf0, cf0 = coords(t)
            return pltpu.make_async_copy(
                r_hbm.at[pl.ds(rf0, WFr), pl.ds(cf0, WFc)],
                r_buf.at[slot], in_sem.at[slot])

        def out_dma(slot, t):
            ro, co, rf0, cf0 = coords(t)
            off_r = pl.multiple_of((ro - rf0) // 2, crq)
            off_c = pl.multiple_of((co - cf0) // 2, 128)
            return pltpu.make_async_copy(
                rc_buf.at[slot, pl.ds(off_r, tr // 2), pl.ds(off_c, tc // 2)],
                out_rc.at[pl.ds(pl.multiple_of(ro // 2, crq), tr // 2),
                          pl.ds(pl.multiple_of(co // 2, 128), tc // 2)],
                out_sem.at[slot])

        in_dma(0, 0).start()

        def body(t, carry):
            slot = t % 2
            nxt = 1 - slot

            @pl.when(t >= 1)
            def _():
                out_dma(nxt, t - 1).wait()

            @pl.when(t + 1 < nt)
            def _():
                in_dma(nxt, t + 1).start()

            in_dma(slot, t).wait()
            _, _, rf0, cf0 = coords(t)
            # Box nesting preserves the low edges (fine i0 == coarse i0,
            # core grids / cycles galerkin coarsening), so cbox carries
            # enough to place the wrap fix on the FINE blur.
            rc = _fw_even2(r_buf[slot],
                           _fw_zero_wrap(rf0, cf0, WFr, WFc, cbox))
            ci0, ci1, cj0, cj1 = (cbox if cbox is not None
                                  else (1, nc_cells - 1, 1, nc_cells - 1))
            gi = (jax.lax.broadcasted_iota(jnp.int32, (WFr // 2, WFc // 2), 0)
                  + rf0 // 2)
            gj = (jax.lax.broadcasted_iota(jnp.int32, (WFr // 2, WFc // 2), 1)
                  + cf0 // 2)
            cmask = ((gi >= ci0) & (gi <= ci1)
                     & (gj >= cj0) & (gj <= cj1))
            rc_buf[slot] = jnp.where(cmask, rc, jnp.zeros((), dtype))
            out_dma(slot, t).start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        out_dma((nt - 1) % 2, nt - 1).wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Sc, Sc), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((2, WFr // 2, WFc // 2), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(r)


def _prolong_add_only(u, ec, *, n, box=None):
    """u + P e_c as one streamed pass (the steps=0 K2 without b)."""
    S = u.shape[-1]
    Sc = ec.shape[-1]
    dtype = u.dtype
    rq, crq = _row_quanta(dtype)
    tr, tc, hr, hc = _geom(S, dtype, fam="k2")
    Wrc, Wcc = tr // 2 + hr, tc // 2 + hc
    WFr, WFc = 2 * Wrc, 2 * Wcc
    nr = pl.cdiv(S, tr)
    ncols = pl.cdiv(S, tc)
    nt = nr * ncols

    def kernel(u_hbm, ec_hbm, out_u, u_buf, c_buf, in_sem, out_sem):
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
                    ec_hbm.at[pl.ds(r0c, Wrc), pl.ds(c0c, Wcc)],
                    c_buf.at[slot], in_sem.at[slot, 1]),
            )

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

            _, _, r0c, c0c = coords(t)
            rf0, cf0 = 2 * r0c, 2 * c0c
            interior, _ = _masks(rf0, cf0, WFr, WFc, n, box)
            corr = _bilinear_prolong(c_buf[slot])
            u_buf[slot] = jnp.where(interior, u_buf[slot] + corr,
                                    jnp.zeros((), dtype))
            out_dma(slot, t).start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        out_dma((nt - 1) % 2, nt - 1).wait()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, S), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((2, Wrc, Wcc), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(u, ec)


@functools.partial(jax.jit, static_argnames=("n", "Sc", "cbox"))
def restrict_fw_pallas(r, n: int, Sc: int, cbox=None):
    """Standalone FW restriction (operator-independent).

    ``cbox``: optional inclusive coarse unknown box (mixed-BC levels).
    """
    rc = _restrict_only(r, n=n, Sc=Sc, cbox=cbox)
    S = r.shape[-1]
    half = S // 2
    if Sc > half:
        zr = jnp.zeros((Sc - half, Sc), rc.dtype)
        zc = jnp.zeros((half, Sc - half), rc.dtype)
        rc = jax.lax.dynamic_update_slice(rc, zr, (half, 0))
        rc = jax.lax.dynamic_update_slice(rc, zc, (0, half))
    return rc


@functools.partial(jax.jit, static_argnames=("n", "box"))
def prolong_add_pallas(u, ec, n: int, box=None):
    """Standalone u + P e_c (operator-independent).

    ``box``: optional inclusive fine unknown box (mixed-BC levels).
    """
    return _prolong_add_only(u, ec, n=n, box=box)


# ---------------------------------------------------------------------------
# Compensated prolongation: P e_c as an exact (hi, err) pair
# ---------------------------------------------------------------------------

def _two_sum_k(a, b):
    """Knuth TwoSum inside a kernel: s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _bilinear_prolong_comp(c):
    """(R, C) coarse -> ((2R, 2C) hi, (2R, 2C) err) with hi+err == P c
    exactly: the dyadic weights make the scalings exact; TwoSum captures
    the 2-/4-term neighbor-sum roundings (precision.prolong_comp's kernel
    twin, for 16385^2-scale grids where the jnp strided-scatter version is
    not viable on TPU)."""
    R, C = c.shape
    cdn = _roll(c, R - 1, 0)                   # c[i+1, j]
    crt = _roll(c, C - 1, 1)                   # c[i, j+1]
    cdr = _roll(crt, R - 1, 0)                 # c[i+1, j+1]
    s, e = _two_sum_k(c, cdn)
    va, vae = 0.5 * s, 0.5 * e
    s, e = _two_sum_k(c, crt)
    ha, hae = 0.5 * s, 0.5 * e
    s1, t1 = _two_sum_k(c, cdn)
    s2, t2 = _two_sum_k(crt, cdr)
    s, t3 = _two_sum_k(s1, s2)
    qa, qae = 0.25 * s, 0.25 * (t1 + (t2 + t3))
    z = jnp.zeros_like(c)
    return (_interleave2(c, va, ha, qa), _interleave2(z, vae, hae, qae))


def _prolong_comp_only(ec, *, n, Sf):
    """(hi, err) = exact-pair P e_c, streamed (read e_c, write hi+err)."""
    S = Sf
    dtype = ec.dtype
    tr, tc, hr, hc = _geom(S, fam="k2")
    Wrc, Wcc = tr // 2 + hr, tc // 2 + hc
    WFr, WFc = 2 * Wrc, 2 * Wcc
    nr = pl.cdiv(S, tr)
    ncols = pl.cdiv(S, tc)
    nt = nr * ncols

    def kernel(ec_hbm, out_hi, out_err, c_buf, hi_buf, err_buf,
               in_sem, out_sem):
        def coords(t):
            ti = t // ncols
            tj = t % ncols
            ro = pl.multiple_of(jnp.clip(ti * tr, 0, S - tr), 16)
            co = pl.multiple_of(jnp.clip(tj * tc, 0, S - tc), 256)
            r0c = pl.multiple_of(
                jnp.clip(ro // 2 - hr // 2, 0, (S - WFr) // 2), 8)
            c0c = pl.multiple_of(
                jnp.clip(co // 2 - hc // 2, 0, (S - WFc) // 2), 128)
            return ro, co, r0c, c0c

        def in_dma(slot, t):
            _, _, r0c, c0c = coords(t)
            return pltpu.make_async_copy(
                ec_hbm.at[pl.ds(r0c, Wrc), pl.ds(c0c, Wcc)],
                c_buf.at[slot], in_sem.at[slot])

        def out_dmas(slot, t):
            ro, co, r0c, c0c = coords(t)
            off_r = pl.multiple_of(ro - 2 * r0c, 16)
            off_c = pl.multiple_of(co - 2 * c0c, 256)
            return (
                pltpu.make_async_copy(
                    hi_buf.at[slot, pl.ds(off_r, tr), pl.ds(off_c, tc)],
                    out_hi.at[pl.ds(ro, tr), pl.ds(co, tc)],
                    out_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    err_buf.at[slot, pl.ds(off_r, tr), pl.ds(off_c, tc)],
                    out_err.at[pl.ds(ro, tr), pl.ds(co, tc)],
                    out_sem.at[slot, 1]),
            )

        in_dma(0, 0).start()

        def body(t, carry):
            slot = t % 2
            nxt = 1 - slot

            @pl.when(t >= 1)
            def _():
                for d in out_dmas(nxt, t - 1):
                    d.wait()

            @pl.when(t + 1 < nt)
            def _():
                in_dma(nxt, t + 1).start()

            in_dma(slot, t).wait()
            _, _, r0c, c0c = coords(t)
            interior, _ = _masks(2 * r0c, 2 * c0c, WFr, WFc, n)
            hi, err = _bilinear_prolong_comp(c_buf[slot])
            z = jnp.zeros((), dtype)
            hi_buf[slot] = jnp.where(interior, hi, z)
            err_buf[slot] = jnp.where(interior, err, z)
            for d in out_dmas(slot, t):
                d.start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, S), dtype),
                   jax.ShapeDtypeStruct((S, S), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, Wrc, Wcc), dtype),
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ec)


@functools.partial(jax.jit, static_argnames=("n", "Sf"))
def prolong_comp_pallas(ec, n: int, Sf: int):
    """Exact-pair prolongation (hi + err == P e_c): streamed kernel."""
    return _prolong_comp_only(ec, n=n, Sf=Sf)

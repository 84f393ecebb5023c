"""Shard-local Pallas kernels over ghost-extended blocks (dist hot path).

The single-chip kernels (kernels/stencil.py, kernels/transfer.py) assume a
square (S, S) grid whose interior is the *global* ``1..n-1`` range.  Under
2D domain decomposition each device owns an (lr, lc) block of the global
grid; these kernels run the same fused smooth/residual/transfer pipelines on
**ghost-extended local blocks**:

* local state shape ``(R, C) = (lr + 2*GR, lc + 2*GC)`` with uniform ghost
  zones ``GR = 16`` rows / ``GC = 256`` cols on every level (f32 tiling:
  row offsets need 8/16-alignment, columns 128/256 — the uniform choice
  makes every fine<->coarse DMA offset statically aligned, since
  ``GR - GR/2 = 8`` and ``GC - GC/2 = 128``);
* ghosts are refreshed **once per kernel launch** by the caller
  (dist.pallas_cycle, strip-wise ``ppermute``) instead of one halo ring per
  sweep (dist.local_ops) — temporal blocking then amortizes ``k`` sweeps of
  communication AND bandwidth into a single exchange + 3 HBM passes;
* boundary conditions use the same inline iota masks as the global kernels,
  but offset by the block's **global origin** — a *dynamic* per-device
  scalar (``lax.axis_index``-derived), passed to the kernel through SMEM so
  one traced program serves every shard position (SPMD);
* the column axis runs **full-width strips** (no column tiling): local
  blocks are narrow enough to stream whole rows through VMEM, which removes
  the column-halo redundancy entirely.

Validity/garbage accounting: kernel outputs are exact on the *owned* region
(and wherever enough ghost depth existed); ghost-region outputs are garbage
by construction and must be refreshed before the next launch.  Ghost cells
whose global coordinates fall outside the physical grid hold zeros (the
caller masks received strips), so windows clamped at the array edge see the
same zero-outside-interior invariant as the single-chip kernels.

Reference parity: these kernels distribute the work of the reference's
single SYCL queue (``Poissons_SYCL.cpp:659``) — the multi-device capability
the reference never had (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _jacobi_step, _rbgs_step, _residual_of, _nbr
from .transfer import _bilinear_prolong, _even2, _fw_aggregate, _step_fn

GR = 16       # ghost rows per side (>= steps+2 for every fused kernel)
GC = 256      # ghost cols per side (lane-tiling quantum after halving)
TR = 256      # row-strip tile
HR = 16       # row halo (= GR; window = TR + 2*HR rows)

# Full-width strips must fit VMEM.  The widest consumer is K1/K2: two
# double-buffered (TR+2*HR, C) f32 windows plus one half-size coarse
# buffer = 18*(TR+2*HR)*C bytes = 93 MB at C = 17920, inside the 110 MB
# vmem_limit — wide enough for a 16385^2 grid on a SINGLE device column
# ((1, k) meshes / the one-real-chip refined runs): the 1024-quantum
# layout (dist.pallas_cycle.pallas_level_sizes) gives S0 = 17408, so
# C = lc + 2*GC = 17920.
MAX_C = 18 * 1024


def supported_local(R: int, C: int, steps: int, dtype) -> bool:
    """Whether the extended-block kernels handle an (R, C) local block.

    ``steps`` counts window-shrink steps (sweeps*mult + fused extras).
    """
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if (R - 2 * GR) <= 0 or (R - 2 * GR) % 16 or (C - 2 * GC) % 256:
        return False
    if C > MAX_C or (C - 2 * GC) <= 0:
        return False
    return steps + 2 <= HR


def _row_geom(R: int, C: int = 0):
    """(tr, hr): row strip size and halo, clamped for small blocks.

    At wide C the Mosaic register allocator spills heavily on full-width
    windows (measured 92.79 MB of spill slots for a (288, 17920) K1
    window — 16385^2-scale single-column runs OOM'd the 128 MB program
    vmem budget), so the window AREA is capped; spills scale with it.
    Narrow blocks (C*288 under the cap) keep the full 256-row strips."""
    if R < TR + 2 * HR:
        return R, 0
    if C:
        max_cells = 2_600_000
        wr = min(TR + 2 * HR, max(2 * HR + 16,
                                  (max_cells // C) // 16 * 16))
        return wr - 2 * HR, HR
    return TR, HR


# ---------------------------------------------------------------------------
# Fused smoother (+ optional residual) on an extended block
# ---------------------------------------------------------------------------

def _streamed_local(u, b, origin, *, n, steps, step_fn, want_residual):
    """Like stencil._streamed but rectangular, full-width, origin-offset."""
    R, C = u.shape
    dtype = u.dtype
    tr, hr = _row_geom(R, C)
    WR = tr + 2 * hr
    nt = pl.cdiv(R, tr)

    def kernel(org_smem, u_hbm, b_hbm, out_u, out_r_or_none, u_buf, b_buf,
               in_sem, out_sem):
        def coords(t):
            r0 = pl.multiple_of(jnp.clip(t * tr - hr, 0, R - WR), 8)
            ro = pl.multiple_of(jnp.clip(t * tr, 0, R - tr), 8)
            return r0, ro

        def in_dmas(slot, t):
            r0, _ = coords(t)
            return (
                pltpu.make_async_copy(u_hbm.at[pl.ds(r0, WR)],
                                      u_buf.at[slot], in_sem.at[slot, 0]),
                pltpu.make_async_copy(b_hbm.at[pl.ds(r0, WR)],
                                      b_buf.at[slot], in_sem.at[slot, 1]),
            )

        def out_dmas(slot, t):
            r0, ro = coords(t)
            off = pl.multiple_of(ro - r0, 8)
            dmas = [pltpu.make_async_copy(
                u_buf.at[slot, pl.ds(off, tr)],
                out_u.at[pl.ds(ro, tr)], out_sem.at[slot, 0])]
            if want_residual:
                dmas.append(pltpu.make_async_copy(
                    b_buf.at[slot, pl.ds(off, tr)],
                    out_r_or_none.at[pl.ds(ro, tr)], out_sem.at[slot, 1]))
            return dmas

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

            r0, _ = coords(t)
            gi = (jax.lax.broadcasted_iota(jnp.int32, (WR, C), 0)
                  + r0 + org_smem[0, 0])
            gj = (jax.lax.broadcasted_iota(jnp.int32, (WR, C), 1)
                  + org_smem[0, 1])
            interior = (gi >= 1) & (gi <= n - 1) & (gj >= 1) & (gj <= n - 1)
            parity = (gi + gj) % 2

            state = u_buf[slot]
            bwin = b_buf[slot]
            for j in range(steps):
                state = step_fn(state, bwin, interior, parity, j)
            u_buf[slot] = state
            if want_residual:
                b_buf[slot] = _residual_of(state, bwin, interior)

            for d in out_dmas(slot, t):
                d.start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    out_shape = [jax.ShapeDtypeStruct((R, C), dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if want_residual:
        out_shape.append(jax.ShapeDtypeStruct((R, C), dtype))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    kern = kernel if want_residual else (
        lambda org, uh, bh, ou, *scr: kernel(org, uh, bh, ou, None, *scr))

    return pl.pallas_call(
        kern,
        out_shape=tuple(out_shape) if want_residual else out_shape[0],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(out_specs) if want_residual else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((2, WR, C), dtype),
            pltpu.VMEM((2, WR, C), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WR * C * (8 * steps + (6 if want_residual else 0))),
            bytes_accessed=int(R * C * 4 * (2 + (2 if want_residual else 1))),
            transcendentals=0,
        ),
    )(origin, u, b)


# ---------------------------------------------------------------------------
# K1-local: pre-smooth + residual + FW restrict (fine ext -> coarse ext)
# ---------------------------------------------------------------------------

def _k1_local(u, b, origin, *, n, steps, smoother, omega):
    R, C = u.shape
    dtype = u.dtype
    # R = lr + 2*GR -> coarse extended rows = lr/2 + 2*GR = R//2 + GR.
    Rc, Cc = R // 2 + GR, C // 2 + GC
    tr, hr = _row_geom(R, C)
    WFr = tr + 2 * hr
    nt = pl.cdiv(R, tr)
    step = _step_fn(smoother, omega)

    def kernel(org_smem, u_hbm, b_hbm, out_u, out_rc, u_buf, b_buf, rc_buf,
               in_sem, out_sem):
        def coords(t):
            ro = pl.multiple_of(jnp.clip(t * tr, 0, R - tr), 16)
            rf0 = pl.multiple_of(jnp.clip(ro - hr, 0, R - WFr), 16)
            return ro, rf0

        def in_dmas(slot, t):
            _, rf0 = coords(t)
            return (
                pltpu.make_async_copy(u_hbm.at[pl.ds(rf0, WFr)],
                                      u_buf.at[slot], in_sem.at[slot, 0]),
                pltpu.make_async_copy(b_hbm.at[pl.ds(rf0, WFr)],
                                      b_buf.at[slot], in_sem.at[slot, 1]),
            )

        def out_dmas(slot, t):
            ro, rf0 = coords(t)
            off = pl.multiple_of(ro - rf0, 16)
            # coarse local rows: fine local l (even) -> m = l/2 + GR/2
            mo = pl.multiple_of(ro // 2 + GR // 2, 8)
            return (
                pltpu.make_async_copy(
                    u_buf.at[slot, pl.ds(off, tr)],
                    out_u.at[pl.ds(ro, tr)], out_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    rc_buf.at[slot, pl.ds(pl.multiple_of(off // 2, 8),
                                          tr // 2)],
                    out_rc.at[pl.ds(mo, tr // 2),
                              pl.ds(GC // 2, C // 2)],
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

            _, rf0 = coords(t)
            gi = (jax.lax.broadcasted_iota(jnp.int32, (WFr, C), 0)
                  + rf0 + org_smem[0, 0])
            gj = (jax.lax.broadcasted_iota(jnp.int32, (WFr, C), 1)
                  + org_smem[0, 1])
            interior = (gi >= 1) & (gi <= n - 1) & (gj >= 1) & (gj <= n - 1)
            parity = (gi + gj) % 2

            state = u_buf[slot]
            bwin = b_buf[slot]
            for j in range(steps):
                state = step(state, bwin, interior, parity, j)
            u_buf[slot] = state
            r = _residual_of(state, bwin, interior)
            rc = _even2(_fw_aggregate(r))
            # coarse global coords of rc[q, qc]: fine global / 2
            hi = (jax.lax.broadcasted_iota(jnp.int32, (WFr // 2, C // 2), 0)
                  + (rf0 + org_smem[0, 0]) // 2)
            hj = (jax.lax.broadcasted_iota(jnp.int32, (WFr // 2, C // 2), 1)
                  + org_smem[0, 1] // 2)
            ncs = n // 2
            cmask = (hi >= 1) & (hi <= ncs - 1) & (hj >= 1) & (hj <= ncs - 1)
            rc_buf[slot] = jnp.where(cmask, rc, jnp.zeros((), dtype))

            for d in out_dmas(slot, t):
                d.start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((R, C), dtype),
                   jax.ShapeDtypeStruct((Rc, Cc), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, WFr, C), dtype),
            pltpu.VMEM((2, WFr, C), dtype),
            pltpu.VMEM((2, WFr // 2, C // 2), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WFr * C * (8 * steps + 16)),
            bytes_accessed=int(R * C * 4 * 3.3),
            transcendentals=0,
        ),
    )(origin, u, b)


# ---------------------------------------------------------------------------
# K2-local: prolong + correct + post-smooth (+ owned residual norm^2)
# ---------------------------------------------------------------------------

def _k2_local(u, b, ec, origin, *, n, steps, smoother, omega,
              want_resnorm=False):
    R, C = u.shape
    dtype = u.dtype
    Rc, Cc = R // 2 + GR, C // 2 + GC
    assert ec.shape == (Rc, Cc), (ec.shape, (Rc, Cc))
    tr, hr = _row_geom(R, C)
    WFr = tr + 2 * hr
    Wrc, Wcc = WFr // 2, C // 2
    nt = pl.cdiv(R, tr)
    step = _step_fn(smoother, omega)

    def kernel(org_smem, u_hbm, b_hbm, ec_hbm, out_u, out_ss,
               u_buf, b_buf, c_buf, ss_acc, in_sem, out_sem):
        def coords(t):
            ro = pl.multiple_of(jnp.clip(t * tr, 0, R - tr), 16)
            rf0 = pl.multiple_of(jnp.clip(ro - hr, 0, R - WFr), 16)
            # coarse window start: fine local l -> m = l/2 + GR/2
            mc0 = pl.multiple_of(rf0 // 2 + GR // 2, 8)
            return ro, rf0, mc0

        def in_dmas(slot, t):
            _, rf0, mc0 = coords(t)
            return (
                pltpu.make_async_copy(u_hbm.at[pl.ds(rf0, WFr)],
                                      u_buf.at[slot], in_sem.at[slot, 0]),
                pltpu.make_async_copy(b_hbm.at[pl.ds(rf0, WFr)],
                                      b_buf.at[slot], in_sem.at[slot, 1]),
                pltpu.make_async_copy(
                    ec_hbm.at[pl.ds(mc0, Wrc), pl.ds(GC // 2, Wcc)],
                    c_buf.at[slot], in_sem.at[slot, 2]),
            )

        def out_dma(slot, t):
            ro, rf0, _ = coords(t)
            off = pl.multiple_of(ro - rf0, 16)
            return pltpu.make_async_copy(
                u_buf.at[slot, pl.ds(off, tr)],
                out_u.at[pl.ds(ro, tr)], out_sem.at[slot])

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

            _, rf0, _ = coords(t)
            gi = (jax.lax.broadcasted_iota(jnp.int32, (WFr, C), 0)
                  + rf0 + org_smem[0, 0])
            gj = (jax.lax.broadcasted_iota(jnp.int32, (WFr, C), 1)
                  + org_smem[0, 1])
            interior = (gi >= 1) & (gi <= n - 1) & (gj >= 1) & (gj <= n - 1)
            parity = (gi + gj) % 2
            corr = _bilinear_prolong(c_buf[slot])
            state = jnp.where(interior, u_buf[slot] + corr,
                              jnp.zeros((), dtype))
            bwin = b_buf[slot]
            for j in range(steps):
                state = step(state, bwin, interior, parity, j)
            u_buf[slot] = state
            if want_resnorm:
                # Owned-and-claimed cells only: unclamped tile bounds
                # prevent edge double-counts; the owned-range bound keeps
                # ghost cells out of the global psum.
                li = jax.lax.broadcasted_iota(jnp.int32, (WFr, C), 0) + rf0
                lj = jax.lax.broadcasted_iota(jnp.int32, (WFr, C), 1)
                claim = (interior
                         & (li >= jnp.maximum(t * tr, GR))
                         & (li < jnp.minimum((t + 1) * tr, R - GR))
                         & (lj >= GC) & (lj < C - GC))
                r = jnp.where(claim, bwin - 4.0 * state + _nbr(state),
                              jnp.zeros((), dtype)).astype(jnp.float32)
                ss_acc[0, 0] = ss_acc[0, 0] + jnp.sum(r * r)
            out_dma(slot, t).start()
            return carry

        ss_acc[0, 0] = jnp.float32(0.0)
        jax.lax.fori_loop(0, nt, body, 0)
        out_ss[0, 0] = ss_acc[0, 0]
        out_dma((nt - 1) % 2, nt - 1).wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((R, C), dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, WFr, C), dtype),
            pltpu.VMEM((2, WFr, C), dtype),
            pltpu.VMEM((2, Wrc, Wcc), dtype),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WFr * C * (8 * steps + 12)),
            bytes_accessed=int(R * C * 4 * 3.3),
            transcendentals=0,
        ),
    )(origin, u, b, ec)


# ---------------------------------------------------------------------------
# Public entry points (called inside shard_map; origin is a (1, 2) int32)
# ---------------------------------------------------------------------------

def _mult(smoother: str) -> int:
    return 2 if smoother == "rbgs" else 1


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "smoother",
                                             "omega"))
def smooth_ext(u, b, origin, n: int, sweeps: int, smoother: str, omega):
    if sweeps <= 0:
        return u
    steps = _mult(smoother) * sweeps
    return _streamed_local(u, b, origin, n=n, steps=steps,
                           step_fn=_step_fn(smoother, omega),
                           want_residual=False)


@functools.partial(jax.jit, static_argnames=("n",))
def residual_ext(u, b, origin, n: int):
    _, r = _streamed_local(u, b, origin, n=n, steps=0,
                           step_fn=_jacobi_step(1.0), want_residual=True)
    return r


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "smoother",
                                             "omega"))
def smooth_restrict_ext(u, b, origin, n: int, sweeps: int, smoother: str,
                        omega):
    """K1 on an extended block: smooth, residual, FW-restrict.

    Returns (u', rc_ext); rc_ext is the next level's extended block with
    valid owned region (ghosts must be refreshed by the caller).
    """
    steps = _mult(smoother) * sweeps
    return _k1_local(u, b, origin, n=n, steps=steps, smoother=smoother,
                     omega=omega)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "smoother",
                                             "omega", "want_resnorm"))
def prolong_smooth_ext(u, b, ec, origin, n: int, sweeps: int, smoother: str,
                       omega, want_resnorm: bool = False):
    """K2 on an extended block: u <- smooth(u + P ec, b).

    With ``want_resnorm`` also returns this shard's owned ||b - A u'||^2
    (psum across the mesh for the global norm).
    """
    steps = _mult(smoother) * sweeps
    un, ss = _k2_local(u, b, ec, origin, n=n, steps=steps, smoother=smoother,
                       omega=omega, want_resnorm=want_resnorm)
    if want_resnorm:
        return un, ss[0, 0]
    return un

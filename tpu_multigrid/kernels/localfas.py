"""Shard-local fused FAS kernels over ghost-extended blocks.

The distributed twin of :mod:`kernels.fas` on the extended-block geometry
of :mod:`kernels.local` (GR/GC ghost zones, full-width row strips, SMEM
global origin): one K1f launch covers the FAS downward half-visit on a
shard — nonlinear smoothing sweeps, nonlinear residual, solution
injection, and the coarse FAS RHS ``bc = N_c(inject u) + FW(b − N(u))``
evaluated in-VMEM — and one K2f launch covers prolong + correct +
post-smooth (+ the owned-region nonlinear residual norm for until-tol
drivers, psum'd by the caller).

Validity contract (same as kernels/local.py): outputs are exact on the
owned region; ghost-region outputs are garbage and must be refreshed by
the caller (dist.fas_pallas).  The owned coarse FAS RHS reads the
injected solution's coarse neighbors (fine reach ``steps + 2``), the
same depth bound as the linear K1 (``supported_local``).

Both nonlinear families ride the same harnesses through the window
closures of :mod:`kernels.fas` (pointwise Jacobi-Newton / quasilinear
Picard-Jacobi).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fas import _pq_capply, _pq_residual, _pq_step, _pw_step_resid_capply
from .local import GC, GR, HR, TR, supported_local
from .transfer import _even2, _fw_even2

__all__ = ["fas_supported_local", "fas_smooth_restrict_ext",
           "fas_prolong_smooth_ext", "qfas_smooth_restrict_ext",
           "qfas_prolong_smooth_ext"]


def fas_supported_local(R: int, C: int, steps: int, dtype) -> bool:
    """Same geometry gate as the linear ext kernels: the FAS payload's
    deepest read (coarse-stencil neighbors of the injection, fine reach
    ``steps + 2``) matches the linear residual+FW reach."""
    return supported_local(R, C, steps, dtype)


# ---------------------------------------------------------------------------
# K1f-local: nonlinear smooth + residual + injection + FAS coarse RHS
# ---------------------------------------------------------------------------

def _k1f_local(u, b, origin, *, n, steps, step, resid, capply, tps=2):
    """Returns (u', uc0_ext, bc_ext) on extended blocks (owned valid)."""
    R, C = u.shape
    dtype = u.dtype
    Rc, Cc = R // 2 + GR, C // 2 + GC
    tr, hr = (TR, HR) if R >= TR + 2 * HR else (R, 0)
    WFr = tr + 2 * hr
    nt = pl.cdiv(R, tr)

    def kernel(org_smem, u_hbm, b_hbm, out_u, out_uc, out_bc,
               u_buf, b_buf, uc_buf, bc_buf, in_sem, out_sem):
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
            csrc = pl.ds(pl.multiple_of(off // 2, 8), tr // 2)
            cdst_r = pl.ds(mo, tr // 2)
            cdst_c = pl.ds(GC // 2, C // 2)
            return (
                pltpu.make_async_copy(
                    u_buf.at[slot, pl.ds(off, tr)],
                    out_u.at[pl.ds(ro, tr)], out_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    uc_buf.at[slot, csrc],
                    out_uc.at[cdst_r, cdst_c], out_sem.at[slot, 1]),
                pltpu.make_async_copy(
                    bc_buf.at[slot, csrc],
                    out_bc.at[cdst_r, cdst_c], out_sem.at[slot, 2]),
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

            state = u_buf[slot]
            bwin = b_buf[slot]
            for j in range(steps):
                state = step(state, bwin, interior, j)
            u_buf[slot] = state
            r = resid(state, bwin, interior)
            rc = _fw_even2(r)
            hi = (jax.lax.broadcasted_iota(jnp.int32, (WFr // 2, C // 2), 0)
                  + (rf0 + org_smem[0, 0]) // 2)
            hj = (jax.lax.broadcasted_iota(jnp.int32, (WFr // 2, C // 2), 1)
                  + org_smem[0, 1] // 2)
            ncs = n // 2
            cmask = (hi >= 1) & (hi <= ncs - 1) & (hj >= 1) & (hj <= ncs - 1)
            z = jnp.zeros((), dtype)
            uc0 = jnp.where(cmask, _even2(state), z)
            uc_buf[slot] = uc0
            bc_buf[slot] = jnp.where(cmask,
                                     capply(uc0, cmask)
                                     + jnp.where(cmask, rc, z), z)

            for d in out_dmas(slot, t):
                d.start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((R, C), dtype),
                   jax.ShapeDtypeStruct((Rc, Cc), dtype),
                   jax.ShapeDtypeStruct((Rc, Cc), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 3,
        scratch_shapes=[
            pltpu.VMEM((2, WFr, C), dtype),
            pltpu.VMEM((2, WFr, C), dtype),
            pltpu.VMEM((2, WFr // 2, C // 2), dtype),
            pltpu.VMEM((2, WFr // 2, C // 2), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WFr * C * (12 * steps + 24)),
            bytes_accessed=int(R * C * 4 * 3.6),
            transcendentals=int(nt * WFr * C * (tps * steps + 1)),
        ),
    )(origin, u, b)


# ---------------------------------------------------------------------------
# K2f-local: prolong + correct + nonlinear post-smooth (+ owned nl resnorm)
# ---------------------------------------------------------------------------

def _k2f_local(u, b, ec, origin, *, n, steps, step, resid,
               want_resnorm=False, tps=2):
    from .transfer import _bilinear_prolong

    R, C = u.shape
    dtype = u.dtype
    Rc, Cc = R // 2 + GR, C // 2 + GC
    assert ec.shape == (Rc, Cc), (ec.shape, (Rc, Cc))
    tr, hr = (TR, HR) if R >= TR + 2 * HR else (R, 0)
    WFr = tr + 2 * hr
    Wrc, Wcc = WFr // 2, C // 2
    nt = pl.cdiv(R, tr)

    def kernel(org_smem, u_hbm, b_hbm, ec_hbm, out_u, out_ss,
               u_buf, b_buf, c_buf, ss_acc, in_sem, out_sem):
        def coords(t):
            ro = pl.multiple_of(jnp.clip(t * tr, 0, R - tr), 16)
            rf0 = pl.multiple_of(jnp.clip(ro - hr, 0, R - WFr), 16)
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
            corr = _bilinear_prolong(c_buf[slot])
            state = jnp.where(interior, u_buf[slot] + corr,
                              jnp.zeros((), dtype))
            bwin = b_buf[slot]
            for j in range(steps):
                state = step(state, bwin, interior, j)
            u_buf[slot] = state
            if want_resnorm:
                li = jax.lax.broadcasted_iota(jnp.int32, (WFr, C), 0) + rf0
                lj = jax.lax.broadcasted_iota(jnp.int32, (WFr, C), 1)
                claim = (interior
                         & (li >= jnp.maximum(t * tr, GR))
                         & (li < jnp.minimum((t + 1) * tr, R - GR))
                         & (lj >= GC) & (lj < C - GC))
                r = resid(state, bwin, claim).astype(jnp.float32)
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
            flops=int(nt * WFr * C * (12 * steps + 12)),
            bytes_accessed=int(R * C * 4 * 3.3),
            transcendentals=int(nt * WFr * C
                                * (tps * steps
                                   + (1 if want_resnorm else 0))),
        ),
    )(origin, u, b, ec)


# ---------------------------------------------------------------------------
# Public entry points (called inside shard_map; origin is a (1, 2) int32)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "sweeps", "omega", "phi",
                                             "dphi", "h2", "diag"))
def fas_smooth_restrict_ext(u, b, origin, n: int, sweeps: int, omega: float,
                            phi, dphi, h2: float, diag: float = 4.0):
    """FAS K1f on an extended block (pointwise family).

    Returns (u', uc0_ext, bc_ext); the coarse outputs are the next
    level's extended blocks with valid owned regions (ghosts must be
    refreshed by the caller)."""
    step, resid, capply = _pw_step_resid_capply(float(omega), float(h2),
                                                float(diag), phi, dphi)
    return _k1f_local(u, b, origin, n=n, steps=sweeps, step=step,
                      resid=resid, capply=capply)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "omega", "phi",
                                             "dphi", "h2", "diag",
                                             "want_resnorm"))
def fas_prolong_smooth_ext(u, b, ec, origin, n: int, sweeps: int,
                           omega: float, phi, dphi, h2: float,
                           diag: float = 4.0, want_resnorm: bool = False):
    """FAS K2f on an extended block; with ``want_resnorm`` also returns
    this shard's owned ||b − N(u')||² (psum across the mesh)."""
    step, resid, _ = _pw_step_resid_capply(float(omega), float(h2),
                                           float(diag), phi, dphi)
    un, ss = _k2f_local(u, b, ec, origin, n=n, steps=sweeps, step=step,
                        resid=resid, want_resnorm=want_resnorm)
    if want_resnorm:
        return un, ss[0, 0]
    return un


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "omega", "a"))
def qfas_smooth_restrict_ext(u, b, origin, n: int, sweeps: int,
                             omega: float, a):
    """Quasilinear FAS K1f on an extended block (Picard-Jacobi windows)."""
    return _k1f_local(u, b, origin, n=n, steps=sweeps,
                      step=_pq_step(float(omega), a),
                      resid=_pq_residual(a), capply=_pq_capply(a), tps=4)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "omega", "a",
                                             "want_resnorm"))
def qfas_prolong_smooth_ext(u, b, ec, origin, n: int, sweeps: int,
                            omega: float, a, want_resnorm: bool = False):
    un, ss = _k2f_local(u, b, ec, origin, n=n, steps=sweeps,
                        step=_pq_step(float(omega), a),
                        resid=_pq_residual(a), want_resnorm=want_resnorm,
                        tps=4)
    if want_resnorm:
        return un, ss[0, 0]
    return un

"""Fused FAS super-kernels: the nonlinear (Full Approximation Scheme)
level visit as two streamed Pallas launches.

Measured motivation (BENCH.md "FAS tier cost A/B", r4): the jnp FAS
Bratu V-cycle runs 5.6x the jnp linear cycle and 41x the fused linear
K1/K2 cycle at 2049^2 — the largest unfused multiplier left in the
framework.  The nonlinearity itself is pointwise (phi(u), phi'(u) — one
VPU transcendental per cell for Bratu), so the same ghost-zone temporal
blocking as the linear super-kernels (kernels/transfer.py) applies; only
the step function and the restriction payload change.

K1f — FAS downward half-visit in ONE launch (~3.6 HBM passes of the
fine grid):

    nu1 Jacobi-Newton sweeps   u += om*(b - A u - h^2 phi(u)) / (diag + h^2 phi'(u))
    nonlinear residual         r  = b - A u - h^2 phi(u)
    solution injection         uc0[i,j] = u[2i, 2j]           (coarse out)
    FAS coarse RHS             bc = A_c uc0 + h_c^2 phi(uc0) + FW(r)  (coarse out)

The coarse-operator application A_c uc0 + h_c^2 phi(uc0) is evaluated
in-VMEM on the injected half-window (its 1-coarse-ring neighborhood is
always inside the fine window's halo), so the jnp tier's separate
coarse-grid ``opc.apply`` pass disappears entirely.

K2f — upward half-visit: u <- JN-smooth(u + P(uc - uc0), b, nu2), with
an optional fused nonlinear residual norm for until-tol drivers.

Both nonlinear families ride the same two harnesses through window
closures: the pointwise family (Jacobi-Newton; ``fas_*`` entries) and the
quasilinear flux family (Picard-Jacobi with edge coefficients a(midpoint)
recomputed in-VMEM per sweep — zero stored planes; ``qfas_*`` entries).

Semantics mirror ``core.nonlinear.{PointwiseNonlinearOp,
QuasilinearFluxOp}.nsmooth`` / ``cycles.fas.fas_cycle`` (reference
anchor: the FMG/V-cycle recursion being generalized,
``Poissons_SYCL.cpp:575-650``; the reference is linear-only).  Gate: 2D
pointwise-over-const-5-point or quasilinear-flux operators, f32,
standard 256-aligned padding — dispatched by
``cycles.fas._use_fas_super_kernels``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _nbr
from .transfer import (_bilinear_prolong, _core_geom, _core_offsets, _even2,
                       _fw_even2, _geom, _masks, _row_quanta, supported)

__all__ = ["fas_supported", "fas_smooth_restrict", "fas_prolong_smooth",
           "fas_prolong_smooth_resnorm", "qfas_smooth_restrict",
           "qfas_prolong_smooth", "qfas_prolong_smooth_resnorm"]


def fas_supported(Sf: int, Sc: int, steps: int, dtype) -> bool:
    """Same geometry gate as the linear super-kernels: the FAS payload's
    deepest read (the coarse-stencil neighbors of the injected solution,
    fine reach ``steps + 2``) matches the linear K1's residual+FW reach."""
    return jnp.dtype(dtype) == jnp.dtype(jnp.float32) and supported(
        Sf, Sc, steps, dtype)


def _jn_step(omega: float, h2: float, diag: float, phi, dphi):
    """One Jacobi-Newton window step, mirroring
    ``PointwiseNonlinearOp.nsmooth``: the nonlinear residual against the
    masked operator, damped pointwise-Newton update, interior-masked.

    When ``dphi is phi`` (Bratu: d/du(-lam e^u) = -lam e^u) the
    transcendental is evaluated ONCE per step — on-chip the exp is the
    dominant VPU cost of the FAS sweep chain."""
    def step(state, bwin, interior, j):
        z = jnp.zeros((), state.dtype)
        pv = phi(state).astype(state.dtype)
        dv = pv if dphi is phi else dphi(state).astype(state.dtype)
        ap = jnp.where(interior, diag * state - _nbr(state) + h2 * pv, z)
        denom = diag + h2 * dv
        upd = omega * (bwin - ap) / denom
        return jnp.where(interior, state + upd, z)
    return step


def _nl_residual(state, bwin, interior, h2: float, diag: float, phi):
    z = jnp.zeros((), state.dtype)
    ap = jnp.where(interior,
                   diag * state - _nbr(state)
                   + h2 * phi(state).astype(state.dtype), z)
    return jnp.where(interior, bwin - ap, z)


# -- quasilinear flux family (QuasilinearFluxOp): Picard-Jacobi windows --

_EDGE_DIRS = ((0, 1), (0, -1), (1, 0), (-1, 0))


def _edge_shift(x, di: int, dj: int):
    """In-kernel twin of ``core.nonlinear._shift`` (wrap roll, safe for
    |d| = 1 under the interior-masked zero-padding contract)."""
    from .stencil import _roll
    if di:
        x = _roll(x, (-di) % x.shape[0], 0)
    if dj:
        x = _roll(x, (-dj) % x.shape[1], 1)
    return x


def _edge_fluxes_diag(state, a):
    """(sum_e a(mid)(u - u_nbr), sum_e a(mid)) over the 4 edges."""
    half = jnp.asarray(0.5, state.dtype)
    flux = jnp.zeros_like(state)
    diag = jnp.zeros_like(state)
    for di, dj in _EDGE_DIRS:
        un = _edge_shift(state, di, dj)
        ae = a(half * (state + un)).astype(state.dtype)
        flux = flux + ae * (state - un)
        diag = diag + ae
    return flux, diag


def _pq_step(omega: float, a):
    """One Picard-Jacobi window step (``QuasilinearFluxOp.nsmooth``)."""
    def step(state, bwin, interior, j):
        z = jnp.zeros((), state.dtype)
        flux, diag = _edge_fluxes_diag(state, a)
        ap = jnp.where(interior, flux, z)
        safe = jnp.where(diag > 0, diag, jnp.ones((), state.dtype))
        return jnp.where(interior, state + omega * (bwin - ap) / safe, z)
    return step


def _pq_residual(a):
    def resid(state, bwin, interior):
        z = jnp.zeros((), state.dtype)
        flux, _ = _edge_fluxes_diag(state, a)
        return jnp.where(interior, bwin - jnp.where(interior, flux, z), z)
    return resid


def _pq_capply(a):
    """Coarse-operator window apply: the flux form is h-independent, so
    N_c is the same expression on the injected solution."""
    def capply(uc0, cmask):
        z = jnp.zeros((), uc0.dtype)
        flux, _ = _edge_fluxes_diag(uc0, a)
        return jnp.where(cmask, flux, z)
    return capply


def _pw_step_resid_capply(omega, h2, diag, phi, dphi):
    """(step, resid, capply) window closures for the pointwise family."""
    h2c = 4.0 * h2

    def resid(state, bwin, interior):
        return _nl_residual(state, bwin, interior, h2, diag, phi)

    def capply(uc0, cmask):
        z = jnp.zeros((), uc0.dtype)
        return jnp.where(cmask,
                         diag * uc0 - _nbr(uc0)
                         + h2c * phi(uc0).astype(uc0.dtype), z)

    return _jn_step(omega, h2, diag, phi, dphi), resid, capply


# ---------------------------------------------------------------------------
# K1f: JN pre-smooth + nonlinear residual + injection + FAS coarse RHS
# ---------------------------------------------------------------------------

def _fas_smooth_restrict(u, b, *, n, Sc, steps, step, resid, capply,
                         transcendentals_per_step=2):
    """Returns (u', uc0, bc): the smoothed fine iterate, the injected
    coarse solution, and the complete FAS coarse equation RHS
    bc = N_c(uc0) + FW(b - N(u')).

    ``step(state, bwin, interior, j)`` / ``resid(state, bwin, interior)``
    / ``capply(uc0, cmask)`` are the family's window closures (pointwise
    Jacobi-Newton or quasilinear Picard-Jacobi)."""
    S = u.shape[-1]
    dtype = u.dtype
    rq, crq = _row_quanta(dtype)
    tr, tc, hr, hc = _geom(S, dtype)
    WFr, WFc = tr + 2 * hr, tc + 2 * hc
    # +1 ring over the linear K1: bc reads coarse-stencil neighbors of the
    # injection, one fine ring deeper than the FW aggregate.
    CHr, CHc, cq = _core_geom(tr, tc, hr, hc, steps + 1, dtype)
    KWr, KWc = tr + 2 * CHr, tc + 2 * CHc
    nr = pl.cdiv(S, tr)
    ncols = pl.cdiv(S, tc)
    nt = nr * ncols
    nc_cells = n // 2

    def kernel(u_hbm, b_hbm, out_u, out_uc, out_bc, u_buf, b_buf,
               uc_buf, bc_buf, in_sem, out_sem):
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
            coff_r = pl.ds(pl.multiple_of(off_r // 2, crq), tr // 2)
            coff_c = pl.ds(pl.multiple_of(off_c // 2, 128), tc // 2)
            cdst_r = pl.ds(pl.multiple_of(ro // 2, crq), tr // 2)
            cdst_c = pl.ds(pl.multiple_of(co // 2, 128), tc // 2)
            return (
                pltpu.make_async_copy(
                    u_buf.at[slot, pl.ds(off_r, tr), pl.ds(off_c, tc)],
                    out_u.at[pl.ds(ro, tr), pl.ds(co, tc)],
                    out_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    uc_buf.at[slot, coff_r, coff_c],
                    out_uc.at[cdst_r, cdst_c], out_sem.at[slot, 1]),
                pltpu.make_async_copy(
                    bc_buf.at[slot, coff_r, coff_c],
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

            ro, co, rf0, cf0 = coords(t)
            # JN steps on the compute core only; the payload passes below
            # read the full window, whose core-excluded strips hold stale
            # pre-smoothing state that never reaches the output claims
            # (same argument as kernels/transfer._smooth_restrict, with
            # the +1-ring depth booked in _core_geom above).
            kr0, kc0 = _core_offsets(ro - rf0, co - cf0, CHr, CHc,
                                     WFr, WFc, KWr, KWc, cq)
            if steps > 0:
                ik, _ = _masks(rf0 + kr0, cf0 + kc0, KWr, KWc, n)
                state = u_buf[slot, pl.ds(kr0, KWr), pl.ds(kc0, KWc)]
                bk = b_buf[slot, pl.ds(kr0, KWr), pl.ds(kc0, KWc)]
                for j in range(steps):
                    state = step(state, bk, ik, j)
                u_buf[slot, pl.ds(kr0, KWr), pl.ds(kc0, KWc)] = state

            interior, _ = _masks(rf0, cf0, WFr, WFc, n)
            r = resid(u_buf[slot], b_buf[slot], interior)
            rc = _fw_even2(r)
            # Coarse-interior mask at this window's half-origin.
            gi = (jax.lax.broadcasted_iota(jnp.int32, (WFr // 2, WFc // 2),
                                           0) + rf0 // 2)
            gj = (jax.lax.broadcasted_iota(jnp.int32, (WFr // 2, WFc // 2),
                                           1) + cf0 // 2)
            cmask = ((gi >= 1) & (gi <= nc_cells - 1)
                     & (gj >= 1) & (gj <= nc_cells - 1))
            z = jnp.zeros((), dtype)
            uc0 = jnp.where(cmask, _even2(u_buf[slot]), z)
            # Coarse FAS RHS: N_c(uc0) + R r, entirely in-window (uc0's
            # coarse neighbors live inside the fine halo).
            uc_buf[slot] = uc0
            bc_buf[slot] = jnp.where(cmask, capply(uc0, cmask) + rc, z)

            for d in out_dmas(slot, t):
                d.start()
            return carry

        jax.lax.fori_loop(0, nt, body, 0)
        for d in out_dmas((nt - 1) % 2, nt - 1):
            d.wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, S), dtype),
                   jax.ShapeDtypeStruct((Sc, Sc), dtype),
                   jax.ShapeDtypeStruct((Sc, Sc), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 3,
        scratch_shapes=[
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((2, WFr, WFc), dtype),
            pltpu.VMEM((2, WFr // 2, WFc // 2), dtype),
            pltpu.VMEM((2, WFr // 2, WFc // 2), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WFr * WFc * (12 * steps + 24)),
            bytes_accessed=int(S * S * 4 * 3.6),
            transcendentals=int(nt * WFr * WFc
                                * (transcendentals_per_step * steps + 1)),
        ),
    )(u, b)


# ---------------------------------------------------------------------------
# K2f: prolong + add correction + JN post-smooth (+ fused nl resnorm)
# ---------------------------------------------------------------------------

def _fas_prolong_smooth(u, b, ec, *, n, steps, step, resid,
                        want_resnorm=False, transcendentals_per_step=2):
    """u <- smooth(u + P e_c, b, steps); optional fused ||b - N(u')||^2."""
    S = u.shape[-1]
    dtype = u.dtype
    rq, crq = _row_quanta(dtype)
    tr, tc, hr, hc = _geom(S, dtype, fam="k2")
    Wrc, Wcc = tr // 2 + hr, tc // 2 + hc
    WFr, WFc = 2 * Wrc, 2 * Wcc
    CHr, CHc, cq = _core_geom(tr, tc, hr, hc, steps, dtype)
    KWr, KWc = tr + 2 * CHr, tc + 2 * CHc
    nr = pl.cdiv(S, tr)
    ncols = pl.cdiv(S, tc)
    nt = nr * ncols

    def kernel(u_hbm, b_hbm, ec_hbm, out_u, out_ss, u_buf, b_buf, c_buf,
               ss_acc, in_sem, out_sem):
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
            kr0, kc0 = _core_offsets(ro - rf0, co - cf0, CHr, CHc,
                                     WFr, WFc, KWr, KWc, cq)
            if steps > 0:
                ik, _ = _masks(rf0 + kr0, cf0 + kc0, KWr, KWc, n)
                state = u_buf[slot, pl.ds(kr0, KWr), pl.ds(kc0, KWc)]
                bk = b_buf[slot, pl.ds(kr0, KWr), pl.ds(kc0, KWc)]
                for j in range(steps):
                    state = step(state, bk, ik, j)
                u_buf[slot, pl.ds(kr0, KWr), pl.ds(kc0, KWc)] = state
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
                r = resid(u_buf[slot], b_buf[slot],
                          claim).astype(jnp.float32)
                ss_acc[0, 0] = ss_acc[0, 0] + jnp.sum(r * r)
            out_dma(slot, t).start()
            return carry

        ss_acc[0, 0] = jnp.float32(0.0)
        jax.lax.fori_loop(0, nt, body, 0)
        out_ss[0, 0] = ss_acc[0, 0]
        out_dma((nt - 1) % 2, nt - 1).wait()

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, S), dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
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
            flops=int(nt * WFr * WFc * (12 * steps + 12)),
            bytes_accessed=int(S * S * 4 * 3.3),
            transcendentals=int(nt * WFr * WFc
                                * (transcendentals_per_step * steps
                                   + (1 if want_resnorm else 0))),
        ),
    )(u, b, ec)


# ---------------------------------------------------------------------------
# Public jitted entry points
# ---------------------------------------------------------------------------

def _zero_tail(a, S):
    """Zero the non-physical coarse tail beyond S/2 (kernel tiles cover
    coarse indices [0, S/2) only), preserving the zero-outside invariant."""
    Sc = a.shape[-1]
    half = S // 2
    if Sc > half:
        zr = jnp.zeros((Sc - half, Sc), a.dtype)
        zc = jnp.zeros((half, Sc - half), a.dtype)
        a = jax.lax.dynamic_update_slice(a, zr, (half, 0))
        a = jax.lax.dynamic_update_slice(a, zc, (0, half))
    return a


@functools.partial(jax.jit, static_argnames=("n", "Sc", "sweeps", "omega",
                                             "phi", "dphi", "h2", "diag"))
def fas_smooth_restrict(u, b, n: int, Sc: int, sweeps: int, omega: float,
                        phi, dphi, h2: float, diag: float = 4.0):
    """FAS K1f (pointwise family): nu1 JN sweeps, then (u', inject(u'),
    A_c inj + h_c^2 phi(inj) + FW(b - N(u'))) in one launch."""
    step, resid, capply = _pw_step_resid_capply(float(omega), float(h2),
                                                float(diag), phi, dphi)
    un, uc0, bc = _fas_smooth_restrict(
        u, b, n=n, Sc=Sc, steps=sweeps, step=step, resid=resid,
        capply=capply)
    S = u.shape[-1]
    return un, _zero_tail(uc0, S), _zero_tail(bc, S)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "omega",
                                             "phi", "dphi", "h2", "diag"))
def fas_prolong_smooth(u, b, ec, n: int, sweeps: int, omega: float,
                       phi, dphi, h2: float, diag: float = 4.0):
    """FAS K2f (pointwise family): u <- JN-smooth(u + P e_c, b, nu2)."""
    step, resid, _ = _pw_step_resid_capply(float(omega), float(h2),
                                           float(diag), phi, dphi)
    un, _ = _fas_prolong_smooth(
        u, b, ec, n=n, steps=sweeps, step=step, resid=resid)
    return un


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "omega",
                                             "phi", "dphi", "h2", "diag"))
def fas_prolong_smooth_resnorm(u, b, ec, n: int, sweeps: int, omega: float,
                               phi, dphi, h2: float, diag: float = 4.0):
    """K2f + fused nonlinear residual norm ||b - N(u')||_2."""
    step, resid, _ = _pw_step_resid_capply(float(omega), float(h2),
                                           float(diag), phi, dphi)
    un, ss = _fas_prolong_smooth(
        u, b, ec, n=n, steps=sweeps, step=step, resid=resid,
        want_resnorm=True)
    return un, jnp.sqrt(ss[0, 0])


# -- quasilinear flux family (Picard-Jacobi; QuasilinearFluxOp) --

@functools.partial(jax.jit, static_argnames=("n", "Sc", "sweeps", "omega",
                                             "a"))
def qfas_smooth_restrict(u, b, n: int, Sc: int, sweeps: int, omega: float,
                         a):
    """Quasilinear FAS K1f: nu1 Picard-Jacobi sweeps (edge coefficients
    a(midpoint) recomputed in-VMEM per sweep), then (u', inject(u'),
    N_c(inj) + FW(b - N(u')))."""
    step = _pq_step(float(omega), a)
    un, uc0, bc = _fas_smooth_restrict(
        u, b, n=n, Sc=Sc, steps=sweeps, step=step, resid=_pq_residual(a),
        capply=_pq_capply(a), transcendentals_per_step=4)
    S = u.shape[-1]
    return un, _zero_tail(uc0, S), _zero_tail(bc, S)


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "omega", "a"))
def qfas_prolong_smooth(u, b, ec, n: int, sweeps: int, omega: float, a):
    """Quasilinear FAS K2f: u <- Picard-smooth(u + P e_c, b, nu2)."""
    un, _ = _fas_prolong_smooth(
        u, b, ec, n=n, steps=sweeps, step=_pq_step(float(omega), a),
        resid=_pq_residual(a), transcendentals_per_step=4)
    return un


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "omega", "a"))
def qfas_prolong_smooth_resnorm(u, b, ec, n: int, sweeps: int,
                                omega: float, a):
    """Quasilinear K2f + fused nonlinear residual norm."""
    un, ss = _fas_prolong_smooth(
        u, b, ec, n=n, steps=sweeps, step=_pq_step(float(omega), a),
        resid=_pq_residual(a), want_resnorm=True,
        transcendentals_per_step=4)
    return un, jnp.sqrt(ss[0, 0])

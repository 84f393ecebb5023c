"""Fused Pallas smoother/residual for variable-coefficient 9-point stencils.

BASELINE config 4: variable-coefficient diffusion with per-node stencil
coefficient arrays (fine level: flux stencil; coarse levels: Galerkin
R A P 9-point operators).  Unlike the constant-coefficient kernels, every
tile must also stream coefficient windows, so the op is coefficient-
bandwidth-bound.  **Symmetric-stencil storage** (VERDICT r1 item 6 /
ROADMAP r1 #2) streams only 5 of the 9 planes — diagonal, E, S, SE, SW —
and derives W/N/NW/NE by one-cell shifts inside VMEM, using the operator's
symmetry A(x, y) == A(y, x): the flux stencil is value-symmetric by
construction and Galerkin R A P preserves it bitwise (tested).  Derived
values differ from the stored ones only where they multiply always-zero
(boundary/padding) unknowns.  Traffic per k-sweep launch drops from ~11 to
~7 HBM passes.  The coefficient slab is single-buffered; u/b stay
double-buffered.

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


def _expand_sym(c_buf):
    """[diag, E, S, SE, SW] windows -> (diag, list of 8 (coef, di, dj)).

    W[i,j] = E[i,j-1], N[i,j] = S[i-1,j], NW[i,j] = SE[i-1,j-1],
    NE[i,j] = SW[i-1,j+1] — symmetry A(x,y) = A(y,x) of the stored planes.
    Window-edge wraps only land on halo/masked cells (same invariant as
    the state shifts).
    """
    diag, E, S_, SE, SW = (c_buf[k] for k in range(5))
    W = _shift(E, 0, -1)
    N = _shift(S_, -1, 0)
    NW = _shift(SE, -1, -1)
    NE = _shift(SW, -1, 1)
    planes = [(E, 0, 1), (W, 0, -1), (S_, 1, 0), (N, -1, 0),
              (SE, 1, 1), (SW, 1, -1), (NW, -1, -1), (NE, -1, 1)]
    return diag, planes


def _expand_full(c_buf):
    """9-plane NONSYMMETRIC storage -> (diag, 8 (coef, di, dj)).

    Order [diag, E, S, SE, SW, W, N, NW, NE] (the first five match the
    symmetric layout, so ``_flat_coef`` only appends).  No in-VMEM
    derivation: upwind convection-diffusion and other nonsymmetric
    9-point operators (VERDICT r3 next #3) stream all planes — ~11 HBM
    passes per k-sweep launch instead of the symmetric tier's ~7, still
    3-5x under the unfused jnp chain.
    """
    diag, E, S_, SE, SW, W, N, NW, NE = (c_buf[k] for k in range(9))
    planes = [(E, 0, 1), (W, 0, -1), (S_, 1, 0), (N, -1, 0),
              (SE, 1, 1), (SW, 1, -1), (NW, -1, -1), (NE, -1, 1)]
    return diag, planes


def _expand(c_buf, nplanes: int):
    """Dispatch on the static coefficient-slab depth (5 sym / 9 full)."""
    return _expand_sym(c_buf) if nplanes == 5 else _expand_full(c_buf)


def _offdiag_apply(planes, v, low0=None):
    """sum(coef * shifted v) over the 8 neighbor planes.

    ``low0``: optional ``(row0_mask, col0_mask)`` marking cells at global
    row/col 0 (either entry may be None).  The derived planes
    (:func:`_expand_sym`) and the state shifts both WRAP at the window
    edge; with the default Dirichlet interior every wrapped value lands on
    a masked or halo cell, but a box keeping edge-0 unknowns (Neumann
    sides) makes global row/col 0 real unknowns whose ``i-1``/``j-1``
    terms must be zero (no such neighbor, and the wrapped coefficient is
    garbage).  Windows clamped at the array start are the only place
    global edge 0 appears; interior windows' wraps stay in the halo
    shrink budget.
    """
    acc = jnp.zeros_like(v)
    for coef, di, dj in planes:
        t = coef * _shift(v, di, dj)
        if low0 is not None:
            if di < 0 and low0[0] is not None:
                t = jnp.where(low0[0], jnp.zeros((), v.dtype), t)
            if dj < 0 and low0[1] is not None:
                t = jnp.where(low0[1], jnp.zeros((), v.dtype), t)
        acc = acc + t
    return acc


def _low0_masks(r0, c0, WR, WC, box):
    """(row0, col0) masks for :func:`_offdiag_apply`, or None when the box
    excludes the edge-0 unknowns (then wraps never reach live cells)."""
    if box is None or (box[0] != 0 and box[2] != 0):
        return None
    row0 = col0 = None
    if box[0] == 0:
        gi = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 0) + r0
        row0 = gi == 0
    if box[2] == 0:
        gj = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 1) + c0
        col0 = gj == 0
    return row0, col0


def _var_streamed(u, b, coef, *, n, steps, smoother, omega, want_residual,
                  box=None):
    S = u.shape[-1]
    dtype = u.dtype
    nplanes = coef.shape[0]
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
            i0, i1, j0, j1 = box if box is not None else (1, n - 1,
                                                          1, n - 1)
            gi = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 0) + r0
            gj = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 1) + c0
            interior = ((gi >= i0) & (gi <= i1)
                        & (gj >= j0) & (gj <= j1))
            parity = (gi + gj) % 2

            diag, planes = _expand(c_buf, nplanes)
            low0 = _low0_masks(r0, c0, WR, WC, box)
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
                           * (bwin - _offdiag_apply(planes, state, low0)))
                    state = jnp.where(interior, upd.astype(dtype),
                                      jnp.zeros((), dtype))
                else:  # rbgs half-sweep on color j % 2
                    upd = invd * (bwin - _offdiag_apply(planes, state, low0))
                    color = interior & (parity == (j % 2))
                    state = jnp.where(color, upd.astype(dtype), state)
            u_buf[slot] = state
            if want_residual:
                r = bwin - diag * state - _offdiag_apply(planes, state, low0)
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
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if want_residual:
        out_shape.append(jax.ShapeDtypeStruct((S, S), dtype))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    kern = kernel if want_residual else (
        lambda u_hbm, b_hbm, c_hbm, out_u, *scr: kernel(
            u_hbm, b_hbm, c_hbm, out_u, None, *scr))

    return pl.pallas_call(
        kern,
        out_shape=tuple(out_shape) if want_residual else out_shape[0],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=tuple(out_specs) if want_residual else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((2, WR, WC), dtype),
            pltpu.VMEM((2, WR, WC), dtype),
            pltpu.VMEM((nplanes, WR, WC), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WR * WC * (20 * max(steps, 1) + 20)),
            bytes_accessed=int(S * S * 4 * (nplanes + 2 + steps / 4)),
            transcendentals=0,
        ),
    )(u, b, coef)


def _flat_coef(op):
    """(3, 3, S, S) -> (5, S, S) symmetric planes, or (9, S, S) full.

    Symmetric order: [diagonal, E(0,+1), S(+1,0), SE(+1,+1), SW(+1,-1)];
    the kernel derives W/N/NW/NE by in-VMEM shifts (see _expand_sym).
    Nonsymmetric operators (``op.is_symmetric == False``, e.g. upwind
    convection) append the four minus-direction planes
    [W(0,-1), N(-1,0), NW(-1,-1), NE(-1,+1)] and the kernels stream all
    nine (_expand_full).  Uses the operator's setup-time ``coef_sym``
    planes when present (uploaded with the hierarchy — no per-program
    restack).
    """
    sym = getattr(op, "coef_sym", None)
    if sym is not None:
        return jnp.asarray(sym)
    c = op.coef
    if not getattr(op, "is_symmetric", True):
        return jnp.stack([c[1, 1], c[1, 2], c[2, 1], c[2, 2], c[2, 0],
                          c[1, 0], c[0, 1], c[0, 0], c[0, 2]])
    return jnp.stack([c[1, 1], c[1, 2], c[2, 1], c[2, 2], c[2, 0]])


@functools.partial(jax.jit,
                   static_argnames=("n", "sweeps", "smoother", "omega",
                                    "box"))
def var_smooth(u, b, coef9, n: int, sweeps: int, smoother: str = "jacobi",
               omega: float = 2.0 / 3.0, box=None):
    if sweeps <= 0:
        return u
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    return _var_streamed(u, b, coef9, n=n, steps=steps, smoother=smoother,
                         omega=omega if isinstance(omega, tuple) else float(omega),
                         want_residual=False, box=box)


@functools.partial(jax.jit,
                   static_argnames=("n", "sweeps", "smoother", "omega",
                                    "box"))
def var_smooth_residual(u, b, coef9, n: int, sweeps: int,
                        smoother: str = "jacobi", omega: float = 2.0 / 3.0,
                        box=None):
    steps = 2 * sweeps if smoother == "rbgs" else sweeps
    return _var_streamed(u, b, coef9, n=n, steps=steps, smoother=smoother,
                         omega=omega if isinstance(omega, tuple) else float(omega),
                         want_residual=True, box=box)

"""Fused Pallas TPU stencil kernels for the multigrid hot path.

The reference's smoother costs >=5 device ops + 1 host sync + 1 host copy
per sweep (``Poissons_SYCL.cpp:138-144``, SURVEY.md §3.4).  XLA already
fuses each sweep into ~3 HBM passes (read u, read b, write u), but cannot
fuse *across* sweeps — every sweep round-trips HBM.  These kernels apply
**ghost-zone (overlapped-tile) temporal blocking**: each (TR, TC) output
tile is computed from a (TR+2H, TC+2H) input window, running all ``k``
sweeps in VMEM with the validity region shrinking by one ring per sweep.
Total HBM traffic for k sweeps (+ the residual) is one read of u and b and
one write of u (and r) — ~``3/(3k)`` of the unfused cost — at the price of
~``(1+2H/TR)^2`` redundant compute, a few percent for 512-tiles.

Streaming structure: a single Pallas program (empty grid) walks the tile
grid with a ``fori_loop``, double-buffering HBM->VMEM input DMAs against
compute and VMEM->HBM output DMAs (pallas_guide.md "Double Buffering").
Edge tiles reuse interior-sized windows clamped inward, so every DMA has a
static shape; boundary conditions are enforced by inline iota masks against
the *global* node coordinates, exactly like ``core.ops``.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic constrains HBM memref slices to the dtype tiling: row sizes/offsets
# must be multiples of the sublane tile (8 for f32, 16 for bf16) and column
# sizes/offsets multiples of 128.  Tiles and halos are therefore quantized:
# row halo rounds up to the sublane tile; the column axis is either the full
# (128-multiple) width with no halo, or 1024-wide tiles with a 128 halo.
TILE_R = 512
TILE_C = 1024
COL_HALO = 128
# Smallest grid the streaming kernel accepts; below this the jnp path wins
# anyway (coarse levels are latency-, not bandwidth-bound).
MIN_SIZE = 256


def _row_quantum(dtype) -> int:
    return 16 if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16) else 8


def supported(S: int, dtype, steps: int = 1) -> bool:
    """Whether the streaming kernel handles an (S, S) grid with ``steps``
    window-shrink steps (sweeps, + 1 if a residual is fused).

    The column halo is fixed at ``COL_HALO`` when the grid is wide enough to
    be column-tiled, so deep temporal blocking (``steps > COL_HALO``) would
    silently corrupt columns near tile seams — reject it here and let the
    caller fall back to the jnp path.  Likewise the row tile must stay
    positive after subtracting the (quantized) row halo.
    """
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    if not (S >= MIN_SIZE and S % 128 == 0):
        return False
    q = _row_quantum(dtype)
    hr = ((max(steps, 1) + q - 1) // q) * q
    if S - 2 * hr < q:
        return False
    if S >= TILE_C + 2 * COL_HALO and steps > COL_HALO:
        return False
    return True


def _tile_sizes(S: int, halo: int, dtype):
    """(TR, TC, HR, HC): quantized tile and halo sizes for an (S, S) grid."""
    q = _row_quantum(dtype)
    hr = ((halo + q - 1) // q) * q
    tr = min(TILE_R, S - 2 * hr)
    tr -= tr % q
    assert tr >= q, (
        f"row tile collapsed: S={S}, halo={halo} (quantized {hr}) — caller "
        f"must gate on supported(S, dtype, steps)")
    if S >= TILE_C + 2 * COL_HALO:
        tc, hc = TILE_C, COL_HALO
        assert halo <= hc, (
            f"temporal-blocking depth {halo} exceeds the fixed column halo "
            f"{hc} — caller must gate on supported(S, dtype, steps)")
    else:
        tc, hc = S, 0          # full-width strips, no column halo
    return tr, tc, hr, hc


# ---------------------------------------------------------------------------
# Step functions (applied to the full VMEM window each pseudo-sweep)
# ---------------------------------------------------------------------------

def _roll(x, shift: int, axis: int):
    """Shape-preserving circular shift inside a kernel.

    f32 uses ``pltpu.roll`` (tpu.dynamic_rotate); other dtypes use
    concat-of-slices — Mosaic has no sub-32-bit rotate ("Rotate with
    non-32-bit data"), so the bf16 path must avoid it.
    """
    size = x.shape[axis]
    shift %= size
    if shift == 0:
        return x
    if x.dtype == jnp.float32:
        return pltpu.roll(x, shift, axis)
    if axis == 0:
        return jnp.concatenate([x[size - shift:, :], x[: size - shift, :]], 0)
    return jnp.concatenate([x[:, size - shift:], x[:, : size - shift]], 1)


def _nbr(x):
    wr, wc = x.shape
    return (_roll(x, 1, 0) + _roll(x, wr - 1, 0)
            + _roll(x, 1, 1) + _roll(x, wc - 1, 1))


def _jacobi_step(omega):
    """Weighted-Jacobi window step; ``omega`` is a float or a per-step tuple
    (Chebyshev schedule, core.ops.chebyshev_omegas) indexed by the unrolled
    step counter ``j``."""
    def step(state, b, interior, parity, j):
        w = omega[j % len(omega)] if isinstance(omega, tuple) else omega
        upd = ((1.0 - w) * state
               + (w * 0.25) * (b + _nbr(state))).astype(state.dtype)
        return jnp.where(interior, upd, jnp.zeros((), state.dtype))
    return step


def _rbgs_step():
    def step(state, b, interior, parity, j):
        # half-sweep j updates color j % 2
        upd = (0.25 * (b + _nbr(state))).astype(state.dtype)
        color = interior & (parity == (j % 2))
        return jnp.where(color, upd, state)
    return step


def _residual_of(state, b, interior):
    r = (b - 4.0 * state + _nbr(state)).astype(state.dtype)
    return jnp.where(interior, r, jnp.zeros((), state.dtype))


# ---------------------------------------------------------------------------
# Generic static 9-point stencil (constant weights known at trace time)
# ---------------------------------------------------------------------------
#
# ``stencil[di+1][dj+1]`` multiplies u[i+di, j+dj] in (A u)[i, j] — the
# same layout as VarStencilOp.coef, but as compile-time floats: zero
# stored planes and zero extra HBM traffic vs the 5-point kernels.  Covers
# the Mehrstellen fourth-order operator (core.operators.Const9Op) and any
# other constant compact stencil.

def _off_app9(x, w):
    """Off-diagonal application sum_{(di,dj)!=(0,0)} w[di][dj]*x[i+di,j+dj]
    with static weights (skipping exact zeros — the 5-point corners)."""
    R, C = x.shape
    sh = {-1: 1, 1: R - 1}          # roll amount for x[i+di] along rows
    shc = {-1: 1, 1: C - 1}
    out = None
    for di in (-1, 0, 1):
        row = None
        for dj in (-1, 0, 1):
            c = w[di + 1][dj + 1]
            if (di == 0 and dj == 0) or c == 0.0:
                continue
            if row is None:
                row = x if di == 0 else _roll(x, sh[di], 0)
            t = row if dj == 0 else _roll(row, shc[dj], 1)
            term = c * t
            out = term if out is None else out + term
    return out if out is not None else jnp.zeros_like(x)


def _jacobi9_step(omega, w):
    """Weighted Jacobi on a static 9-point stencil, mirroring
    ``Const9Op.smooth``: v <- (1-om)v + (om/diag)(b - offapp(v))."""
    inv_d = 1.0 / w[1][1]

    def step(state, b, interior, parity, j):
        om = omega[j % len(omega)] if isinstance(omega, tuple) else omega
        upd = ((1.0 - om) * state
               + (om * inv_d) * (b - _off_app9(state, w))).astype(state.dtype)
        return jnp.where(interior, upd, jnp.zeros((), state.dtype))
    return step


def _rbgs9_step(w):
    """Parity-masked damped block relaxation (``Const9Op.smooth`` rbgs
    note: the 9-point stencil couples same-color diagonal neighbors, so
    this is a valid smoother, not exact GS)."""
    inv_d = 1.0 / w[1][1]

    def step(state, b, interior, parity, j):
        upd = (inv_d * (b - _off_app9(state, w))).astype(state.dtype)
        color = interior & (parity == (j % 2))
        return jnp.where(color, upd, state)
    return step


def _residual9_of(state, b, interior, w):
    r = (b - w[1][1] * state - _off_app9(state, w)).astype(state.dtype)
    return jnp.where(interior, r, jnp.zeros((), state.dtype))


# ---------------------------------------------------------------------------
# Streaming harness
# ---------------------------------------------------------------------------

def _streamed(u, b, *, n: int, steps: int, step_fn, want_residual: bool):
    """Run ``steps`` window-steps of ``step_fn`` over the whole grid.

    Returns u' (and r' if ``want_residual``), identical to applying the
    corresponding ``core.ops`` functions, in ~3 (4) HBM passes total.
    """
    S = u.shape[-1]
    H = steps + (1 if want_residual else 0)
    dtype = u.dtype
    TR, TC, HR, HC = _tile_sizes(S, H, dtype)
    WR, WC = TR + 2 * HR, TC + 2 * HC
    nr = pl.cdiv(S, TR)
    nc = pl.cdiv(S, TC)
    nt = nr * nc
    q = _row_quantum(dtype)

    def kernel(u_hbm, b_hbm, out_u, out_r_or_none, u_buf, b_buf,
               in_sem, out_sem):
        def tile_coords(t):
            ti = t // nc
            tj = t % nc
            # All offsets stay multiples of the Mosaic tiling (q, 128):
            # TR/HR are q-multiples, TC/HC/S are 128-multiples.
            r0 = pl.multiple_of(jnp.clip(ti * TR - HR, 0, S - WR), q)
            c0 = pl.multiple_of(jnp.clip(tj * TC - HC, 0, S - WC), 128)
            ro = pl.multiple_of(jnp.clip(ti * TR, 0, S - TR), q)
            co = pl.multiple_of(jnp.clip(tj * TC, 0, S - TC), 128)
            return r0, c0, ro, co

        def in_dmas(slot, t):
            r0, c0, _, _ = tile_coords(t)
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(r0, WR), pl.ds(c0, WC)],
                    u_buf.at[slot], in_sem.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(r0, WR), pl.ds(c0, WC)],
                    b_buf.at[slot], in_sem.at[slot, 1]),
            )

        def out_dmas(slot, t):
            r0, c0, ro, co = tile_coords(t)
            off_r = pl.multiple_of(ro - r0, q)
            off_c = pl.multiple_of(co - c0, 128)
            dmas = [pltpu.make_async_copy(
                u_buf.at[slot, pl.ds(off_r, TR), pl.ds(off_c, TC)],
                out_u.at[pl.ds(ro, TR), pl.ds(co, TC)],
                out_sem.at[slot, 0])]
            if want_residual:
                dmas.append(pltpu.make_async_copy(
                    b_buf.at[slot, pl.ds(off_r, TR), pl.ds(off_c, TC)],
                    out_r_or_none.at[pl.ds(ro, TR), pl.ds(co, TC)],
                    out_sem.at[slot, 1]))
            return dmas

        for d in in_dmas(0, 0):
            d.start()

        def body(t, carry):
            slot = t % 2
            nxt = 1 - slot

            # The 'nxt' buffers may still be draining tile t-1's outputs;
            # wait before overwriting them with tile t+1's inputs.
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

            r0, c0, _, _ = tile_coords(t)
            gi = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 0) + r0
            gj = jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 1) + c0
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

    out_shape = [jax.ShapeDtypeStruct((S, S), dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if want_residual:
        out_shape.append(jax.ShapeDtypeStruct((S, S), dtype))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    n_out_ch = 2 if want_residual else 1
    bytes_tile = WR * WC * jnp.dtype(dtype).itemsize

    kern = kernel if want_residual else (
        lambda u_hbm, b_hbm, out_u, *scr: kernel(u_hbm, b_hbm, out_u, None,
                                                 *scr))

    result = pl.pallas_call(
        kern,
        out_shape=tuple(out_shape) if want_residual else out_shape[0],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(out_specs) if want_residual else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((2, WR, WC), dtype),
            pltpu.VMEM((2, WR, WC), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(4.5 * 2 * 2 * bytes_tile) + 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(nt * WR * WC * (8 * steps + (6 if want_residual else 0))),
            bytes_accessed=int(S * S * jnp.dtype(dtype).itemsize
                               * (2 + n_out_ch)),
            transcendentals=0,
        ),
    )(u, b)
    return result


# ---------------------------------------------------------------------------
# Public entry points (drop-in replacements for core.ops)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "omega", "sweeps"))
def jacobi_sweeps(u, b, n: int, omega: float, sweeps: int):
    """k fused weighted-Jacobi sweeps in ~3 HBM passes (vs 3k unfused)."""
    if sweeps <= 0:
        return u
    return _streamed(u, b, n=n, steps=sweeps,
                     step_fn=_jacobi_step(omega if isinstance(omega, tuple) else float(omega)), want_residual=False)


@functools.partial(jax.jit, static_argnames=("n", "omega", "sweeps"))
def jacobi_sweeps_residual(u, b, n: int, omega: float, sweeps: int):
    """k fused Jacobi sweeps + the residual of the result, ~4 HBM passes.

    Replaces the reference's sweep-loop + separate residual gemv chain
    (``Poissons_SYCL.cpp:581,604-608``) with one kernel launch.
    """
    return _streamed(u, b, n=n, steps=sweeps,
                     step_fn=_jacobi_step(omega if isinstance(omega, tuple) else float(omega)), want_residual=True)


@functools.partial(jax.jit, static_argnames=("n", "sweeps"))
def rbgs_sweeps(u, b, n: int, sweeps: int):
    """k fused red-black Gauss-Seidel sweeps (2k half-sweeps) in ~3 passes."""
    if sweeps <= 0:
        return u
    return _streamed(u, b, n=n, steps=2 * sweeps, step_fn=_rbgs_step(),
                     want_residual=False)


@functools.partial(jax.jit, static_argnames=("n", "sweeps"))
def rbgs_sweeps_residual(u, b, n: int, sweeps: int):
    return _streamed(u, b, n=n, steps=2 * sweeps, step_fn=_rbgs_step(),
                     want_residual=True)


@functools.partial(jax.jit, static_argnames=("n",))
def residual(u, b, n: int):
    """r = b - A u as one streamed kernel (3 HBM passes)."""
    _, r = _streamed(u, b, n=n, steps=0, step_fn=_jacobi_step(1.0),
                     want_residual=True)
    return r

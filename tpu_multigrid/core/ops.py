"""Pure-jnp (XLA) reference operators for structured-grid 2D multigrid.

Design (see SURVEY.md §7): the reference stores the P1-FEM stiffness matrix in
CSR and applies it with oneMKL sparse gemv (``Poissons_SYCL.cpp:138,604-605``).
On the structured unit-square mesh that matrix *is* the 5-point stencil
``[[0,-1,0],[-1,4,-1],[0,-1,0]]`` (h-independent in FEM scaling; the RHS
carries ``f*h^2``), so this framework is matrix-free: every level is a dense
``(S, S)`` node grid living in HBM, with the physical grid occupying indices
``0..n`` (``n = 2**level`` cells) and homogeneous-Dirichlet boundary plus any
alignment padding held at zero.

Conventions used throughout:

* Arrays may be padded (``S >= n+1``) so fine grids can be tiled/sharded on
  TPU; the *interior* (unknowns) is indices ``1..n-1`` in each axis.
* Interior masks are generated inline from ``broadcasted_iota`` — they cost
  no HBM traffic, unlike a stored mask array.
* Neighbor access uses ``jnp.roll``; wrap-around values only ever land on
  non-interior rows/cols, which the mask zeroes, and padding is maintained at
  zero so interior nodes always read true neighbor values.

Inter-grid transfers use the *variational* pair for nested P1 elements:
bilinear prolongation ``P`` (reference ``interpolation2d``,
``Poissons_SYCL.cpp:337-425``) and its exact adjoint ``R = P^T`` — the
full-weighting stencil ``[[1,2,1],[2,4,2],[1,2,1]]/4`` in FEM scaling.  (The
reference intended full weighting but its ``(1/16)`` integer division zeroed
the operator, ``Poissons_SYCL.cpp:539``; and in FD scaling the textbook
factor is /16.  With the FEM-scaled h-independent stencil, R = P^T needs /4,
which makes Galerkin coarsening R A P *equal* the re-discretized stiffness.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Masks
# ---------------------------------------------------------------------------

def interior_mask(S: int, n: int) -> jnp.ndarray:
    """Boolean (S, S) mask of interior (unknown) nodes: 1 <= i,j <= n-1."""
    i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return (i >= 1) & (i <= n - 1) & (j >= 1) & (j <= n - 1)


def mask_interior(u: jnp.ndarray, n: int) -> jnp.ndarray:
    """Zero out everything but the interior."""
    m = interior_mask(u.shape[-1], n)
    return jnp.where(m, u, jnp.zeros((), u.dtype))


def box_mask(S: int, box) -> jnp.ndarray:
    """Boolean (S, S) mask of an inclusive unknown box (i0, i1, j0, j1).

    Generalizes :func:`interior_mask` (box = (1, n-1, 1, n-1)) for mixed
    Dirichlet/Neumann problems, where Neumann-side boundary nodes are
    unknowns (problems/mixedbc.py).
    """
    i0, i1, j0, j1 = box
    i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return (i >= i0) & (i <= i1) & (j >= j0) & (j <= j1)


def mask_box(u: jnp.ndarray, box) -> jnp.ndarray:
    m = box_mask(u.shape[-1], box)
    return jnp.where(m, u, jnp.zeros((), u.dtype))


# ---------------------------------------------------------------------------
# 5-point stencil primitives
# ---------------------------------------------------------------------------

def neighbor_sum(u: jnp.ndarray) -> jnp.ndarray:
    """u[i-1,j] + u[i+1,j] + u[i,j-1] + u[i,j+1] via rolls.

    Wrapped values only affect rows/cols outside the interior (masked by
    callers); padding is zero by invariant.
    """
    return (
        jnp.roll(u, 1, axis=-2)
        + jnp.roll(u, -1, axis=-2)
        + jnp.roll(u, 1, axis=-1)
        + jnp.roll(u, -1, axis=-1)
    )


def apply_poisson(u: jnp.ndarray, n: int) -> jnp.ndarray:
    """A u with the FEM-scaled 5-point stencil (diagonal 4), interior only.

    Reference equivalent: CSR gemv of the assembled stiffness
    (``Poissons_SYCL.cpp:604-605``).
    """
    out = 4.0 * u - neighbor_sum(u)
    return mask_interior(out.astype(u.dtype), n)


def residual(u: jnp.ndarray, b: jnp.ndarray, n: int) -> jnp.ndarray:
    """r = b - A u on the interior (``Poissons_SYCL.cpp:604-608``)."""
    r = b - 4.0 * u + neighbor_sum(u)
    return mask_interior(r.astype(u.dtype), n)


def chebyshev_omegas(k: int, lo: float = 0.4, hi: float = 2.0) -> tuple:
    """Per-step Jacobi weights for degree-``k`` Chebyshev smoothing.

    The smoother iterates ``v <- v + w_j * D^-1 (b - A v)`` with ``w_j`` the
    reciprocals of the Chebyshev roots on the D^-1 A smoothing interval
    ``[lo, hi]`` — the polynomial that minimizes the max error multiplier
    over that interval (textbook Chebyshev relaxation, the standard
    parallel-friendly smoother in e.g. hypre/AMG).  For the 5-point stencil
    D^-1 A has spectrum (0, 2); high-frequency (coarse-grid-invisible) modes
    live in [0.5, 2], and extending slightly below (default ``lo=0.4``)
    optimizes the measured two-grid factor.  Same per-step cost as plain
    weighted Jacobi (reference smoother, ``Poissons_SYCL.cpp:127``), ~2x
    fewer cycles at degree 2.

    Steps run in **descending-omega order**: the over-relaxed steps
    (``w > 1``, which transiently amplify high-frequency content by up to
    ``|1 - w*hi|``) come first, so every later step damps their rounding
    noise; the final step is the most damping one (``max |1 - w*l| <= 1``
    over the whole spectrum).  The reverse order measurably raises the f32
    residual floor of deep solves (~2x at 8193^2) because the last step
    amplifies all accumulated roundoff with nothing after it.
    """
    import math
    roots = [(lo + hi) / 2 + (hi - lo) / 2 * math.cos(
        math.pi * (2 * j + 1) / (2 * k)) for j in range(k)]
    # roots[] is descending in tau => ascending in omega; reverse it.
    return tuple(sorted((1.0 / t for t in roots), reverse=True))


def jacobi_sweeps(
    u: jnp.ndarray,
    b: jnp.ndarray,
    n: int,
    omega,
    sweeps: int,
) -> jnp.ndarray:
    """`sweeps` sweeps of weighted Jacobi, fixed D = 4I.

    v <- (1-w) v + (w/4)(b + sum of neighbors), the same update the reference
    builds from gemv/scal/add with a host sync per sweep
    (``Poissons_SYCL.cpp:125-147``); here the sweep loop is a single fused
    XLA computation with no host round-trips.

    ``omega`` may be a float (stationary) or a tuple of per-sweep weights
    (Chebyshev smoothing schedule, :func:`chebyshev_omegas`).
    """
    if sweeps <= 0:
        return u
    m = interior_mask(u.shape[-1], n)

    if isinstance(omega, tuple):
        ws = omega
        if len(ws) < sweeps:
            ws = tuple(ws[i % len(ws)] for i in range(sweeps))
        v = u
        for w in ws[:sweeps]:
            vn = (jnp.asarray(1.0 - w, u.dtype) * v
                  + jnp.asarray(0.25 * w, u.dtype) * (b + neighbor_sum(v)))
            v = jnp.where(m, vn, jnp.zeros((), u.dtype))
        return v

    quarter = jnp.asarray(0.25 * omega, u.dtype)
    one_minus = jnp.asarray(1.0 - omega, u.dtype)

    def body(_, v):
        vn = one_minus * v + quarter * (b + neighbor_sum(v))
        return jnp.where(m, vn, jnp.zeros((), u.dtype))

    return jax.lax.fori_loop(0, sweeps, body, u, unroll=min(sweeps, 4))


def redblack_gs_sweeps(
    u: jnp.ndarray,
    b: jnp.ndarray,
    n: int,
    sweeps: int,
) -> jnp.ndarray:
    """Red-black Gauss-Seidel: two masked half-sweeps per sweep.

    Not present in the reference (its only smoother is weighted Jacobi);
    provided per the framework's smoother registry (BASELINE config 2).  On
    TPU the sequential dependence is resolved by checkerboard coloring: all
    same-color updates are independent, so each half-sweep is a full
    vectorized update under a parity mask.
    """
    if sweeps <= 0:
        return u
    S = u.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    inter = (i >= 1) & (i <= n - 1) & (j >= 1) & (j <= n - 1)
    parity = (i + j) % 2
    red = inter & (parity == 0)
    black = inter & (parity == 1)
    quarter = jnp.asarray(0.25, u.dtype)

    def half(v, color):
        vn = quarter * (b + neighbor_sum(v))
        return jnp.where(color, vn, v)

    def body(_, v):
        v = half(v, red)
        v = half(v, black)
        return v

    return jax.lax.fori_loop(0, sweeps, body, u, unroll=min(sweeps, 4))


# ---------------------------------------------------------------------------
# Inter-grid transfers
# ---------------------------------------------------------------------------

def _conv2d(x: jnp.ndarray, w: jnp.ndarray, *, stride=1, lhs_dilation=1):
    """Single-channel 2D convolution over the trailing two axes.

    Strided slicing / scattered strided writes are pathological on TPU
    (lane-dimension gathers: ~400 ms per 8193^2 transfer measured), whereas
    stride-2 and input-dilated convolutions lower to native XLA:TPU conv
    kernels — so both inter-grid transfers are expressed as convs.
    """
    batch = x.shape[:-2]
    xb = x.reshape((-1,) + x.shape[-2:])[:, None]          # N, C=1, H, W
    out = jax.lax.conv_general_dilated(
        xb, w[None, None].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        lhs_dilation=(lhs_dilation, lhs_dilation),
        preferred_element_type=x.dtype if x.dtype != jnp.bfloat16 else jnp.float32,
        # XLA:TPU lowers f32 convs through bf16 MXU passes by default
        # (~1e-2 relative error — enough to disturb coarse corrections);
        # HIGHEST forces f32-accurate accumulation.
        precision=jax.lax.Precision.HIGHEST,
    )
    out = out[:, 0].astype(x.dtype)
    return out.reshape(batch + out.shape[-2:])


_FW_STENCIL = [[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]]


def restrict_fw(rf: jnp.ndarray, nf: int, Sc: int, box=None) -> jnp.ndarray:
    """Full-weighting restriction, FEM scaling R = P^T (stencil /4).

    Fine grid ``(Sf, Sf)`` with ``nf`` cells -> coarse grid ``(Sc, Sc)`` with
    ``nf//2`` cells: a stride-2 convolution with the [[1,2,1],[2,4,2],
    [1,2,1]]/4 kernel.  Requires ``Sf >= 2*Sc - 1`` (hierarchy construction
    guarantees this).  Reference: ``restriction2d``
    (``Poissons_SYCL.cpp:531-546``), with its integer-division bug fixed and
    the FEM /4 scaling so that R A P equals the coarse FEM stiffness.

    ``box``: optional inclusive coarse unknown box (mixed-BC problems; the
    conv's zero padding makes the boundary rows exactly P^T of the
    truncated prolongation, so R = P^T holds on boxes too).
    """
    nc = nf // 2
    Sf = rf.shape[-1]
    w = jnp.asarray(_FW_STENCIL, jnp.float32)
    coarse = _conv2d(rf, w, stride=2)              # side = (Sf+1)//2
    side = coarse.shape[-1]
    if side >= Sc:
        coarse = coarse[..., :Sc, :Sc]
    else:
        # Coarse array is padded beyond the fine array's even rows; the
        # extra rows/cols are non-physical (side > nc always since
        # Sf >= nf+1) and stay zero.
        pad = Sc - side
        coarse = jnp.pad(coarse,
                         [(0, 0)] * (coarse.ndim - 2) + [(0, pad), (0, pad)])
    if box is not None:
        return mask_box(coarse, box)
    return mask_interior(coarse, nc)


def prolong(ec: jnp.ndarray, nc: int, Sf: int, box=None) -> jnp.ndarray:
    """Bilinear prolongation, coarse ``(Sc, Sc)`` -> fine ``(Sf, Sf)``.

    fine[2i,2j] = c[i,j]; odd rows/cols average 2 neighbors; odd-odd averages
    4.  Reference: ``interpolation2d`` (``Poissons_SYCL.cpp:337-425``), whose
    89 lines of even/odd case analysis collapse to four phase averages here.

    Fallback (CPU / coarse-level) implementation: phase averages via rolls +
    four strided scatters.  (An lhs-dilated conv formulation materializes a
    multi-GB intermediate on XLA:TPU, and strided lane scatters are slow
    there — the TPU hot path uses the Pallas transfer kernels instead.)

    ``box``: optional inclusive fine unknown box (mixed-BC problems).
    """
    Sc = ec.shape[-1]
    nf = 2 * nc
    batch = ec.shape[:-2]
    # Only the coarse rows/cols that land inside the fine array matter;
    # everything past nc is non-physical padding (zero) anyway.
    m = min(Sc, (Sf + 1) // 2)
    e = ec[..., :m, :m]
    f = jnp.zeros(batch + (Sf, Sf), ec.dtype)
    lim = 2 * m - 1
    # Even-even: direct injection.
    f = f.at[..., 0:lim:2, 0:lim:2].set(e)
    # Odd rows: vertical 2-point average (contiguous slices).
    va = 0.5 * (e[..., :-1, :] + e[..., 1:, :])
    f = f.at[..., 1 : lim - 1 : 2, 0:lim:2].set(va.astype(ec.dtype))
    # Odd cols: horizontal 2-point average.
    ha = 0.5 * (e[..., :, :-1] + e[..., :, 1:])
    f = f.at[..., 0:lim:2, 1 : lim - 1 : 2].set(ha.astype(ec.dtype))
    # Odd-odd: 4-point average.
    qa = 0.25 * (e[..., :-1, :-1] + e[..., :-1, 1:]
                 + e[..., 1:, :-1] + e[..., 1:, 1:])
    f = f.at[..., 1 : lim - 1 : 2, 1 : lim - 1 : 2].set(qa.astype(ec.dtype))
    if box is not None:
        return mask_box(f, box)
    return mask_interior(f, nf)


def restrict_injection(rf: jnp.ndarray, nf: int, Sc: int) -> jnp.ndarray:
    """Injection restriction: coarse node takes the coinciding fine value.

    Reference v2 semantics (``restriction2D``,
    ``Multigrid_functions.cpp:122-130``): no weighting, coarse dof = fine
    value at the same topological node.  Scaled by 4 to stay consistent with
    the FEM (h-independent stencil) normalization, matching R = P^T's row
    sum so constants transfer identically.
    """
    nc = nf // 2
    w = jnp.zeros((3, 3), jnp.float32).at[1, 1].set(4.0)
    coarse = _conv2d(rf, w, stride=2)
    side = coarse.shape[-1]
    if side >= Sc:
        coarse = coarse[..., :Sc, :Sc]
    else:
        pad = Sc - side
        coarse = jnp.pad(coarse,
                         [(0, 0)] * (coarse.ndim - 2) + [(0, pad), (0, pad)])
    return mask_interior(coarse, nc)


def prolong_p1(ec: jnp.ndarray, nc: int, Sf: int) -> jnp.ndarray:
    """P1 (triangular-element) prolongation: every fine node lies on a
    coarse vertex or a coarse edge of the criss-cross triangulation.

    Reference v2 semantics (``interpolation2D``,
    ``Multigrid_functions.cpp:98-118``): vertex-coincident nodes inject;
    edge-midpoint nodes average the edge's two endpoints — including the
    odd-odd nodes, which sit on the *diagonal* edge and average its two
    endpoints (c[i,j+1] and c[i+1,j] for the NE-SW diagonal), unlike
    bilinear's 4-point average.
    """
    Sc = ec.shape[-1]
    nf = 2 * nc
    batch = ec.shape[:-2]
    m = min(Sc, (Sf + 1) // 2)
    e = ec[..., :m, :m]
    f = jnp.zeros(batch + (Sf, Sf), ec.dtype)
    lim = 2 * m - 1
    f = f.at[..., 0:lim:2, 0:lim:2].set(e)
    va = 0.5 * (e[..., :-1, :] + e[..., 1:, :])
    f = f.at[..., 1 : lim - 1 : 2, 0:lim:2].set(va.astype(ec.dtype))
    ha = 0.5 * (e[..., :, :-1] + e[..., :, 1:])
    f = f.at[..., 0:lim:2, 1 : lim - 1 : 2].set(ha.astype(ec.dtype))
    # Diagonal-edge midpoint: avg of the two diagonal endpoints.
    da = 0.5 * (e[..., 1:, :-1] + e[..., :-1, 1:])
    f = f.at[..., 1 : lim - 1 : 2, 1 : lim - 1 : 2].set(da.astype(ec.dtype))
    return mask_interior(f, nf)


def norm2(r: jnp.ndarray) -> jnp.ndarray:
    """Global L2 norm of a residual grid, returned as f32 (history dtype).

    Accumulates in the input precision (>= f32; bf16 inputs are upcast).
    """
    racc = r.astype(jnp.float32) if r.dtype == jnp.bfloat16 else r
    return jnp.sqrt(jnp.sum(racc * racc)).astype(jnp.float32)

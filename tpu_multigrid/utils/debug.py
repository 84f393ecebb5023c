"""Numerical-safety guards (SURVEY.md §5 "race detection / sanitizers").

The reference shipped five undetected numerical bugs because nothing ever
checked an invariant (integer-division-zeroed restriction at
``Poissons_SYCL.cpp:539,564``, float->int assembly truncation at ``:93``,
doubled interpolation terms at ``:470-471``, an OOB read at ``:564-567``,
and ``omega = 4/5 == 0`` at ``Multigrid_functions.cpp:48``).  These guards
are the JAX-side equivalents: NaN trapping, zero-invariant and shape/dtype
assertions on grids, and operator sanity checks that would have caught all
five.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from ..core import ops


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Trap NaNs produced by any jitted computation inside the scope."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_grid(u, n: int, *, name: str = "grid") -> None:
    """Assert the padded-grid invariants: finite and zero outside the
    interior.  2D grids must be square; 3D grids may be non-cubic
    (lane-aligned (Sz, Sy, Sx) padding, core.ops3d)."""
    u = np.asarray(u)
    if u.ndim not in (2, 3):
        raise AssertionError(f"{name}: expected 2D/3D grid, got {u.shape}")
    if u.ndim == 2 and u.shape[0] != u.shape[1]:
        raise AssertionError(f"{name}: expected square 2D grid, got "
                             f"{u.shape}")
    if min(u.shape) < n + 1:
        raise AssertionError(f"{name}: shape {u.shape} < n+1={n + 1}")
    if not np.all(np.isfinite(u)):
        raise AssertionError(f"{name}: non-finite values present")
    mask = np.zeros(u.shape, bool)
    mask[(slice(1, n),) * u.ndim] = True
    bad = np.abs(u[~mask]).max() if (~mask).any() else 0.0
    if bad != 0.0:
        raise AssertionError(
            f"{name}: zero-outside-interior invariant violated (max |.| = "
            f"{bad:.3e} on boundary/padding)")


def check_operator(op, rng=None) -> None:
    """Operator sanity: symmetry, positive diagonal, masked output, and a
    nonzero action (the reference's zeroed restriction would fail here).
    Works for 2D and 3D operators (dispatches on ``grid_shape``)."""
    rng = rng or np.random.default_rng(0)
    n = op.n
    shape = tuple(getattr(op, "grid_shape", (op.S, op.S)))
    inter = (slice(1, n),) * len(shape)
    x = np.zeros(shape); x[inter] = rng.standard_normal((n - 1,) * len(shape))
    y = np.zeros(shape); y[inter] = rng.standard_normal((n - 1,) * len(shape))
    xj, yj = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    ax, ay = op.apply(xj), op.apply(yj)
    if float(jnp.max(jnp.abs(ax))) == 0.0:
        raise AssertionError("operator action is identically zero")
    lhs, rhs = float(jnp.vdot(ax, yj)), float(jnp.vdot(xj, ay))
    if abs(lhs - rhs) > 1e-3 * (abs(lhs) + abs(rhs) + 1e-30):
        raise AssertionError(f"operator not symmetric: <Ax,y>={lhs} "
                             f"!= <x,Ay>={rhs}")
    xAx = float(jnp.vdot(xj, ax))
    if xAx <= 0:
        raise AssertionError(f"operator not positive definite: <x,Ax>={xAx}")


def check_transfer_pair(nf: int = 16, rng=None, ndim: int = 2) -> None:
    """R = c P^T adjointness (c = 1 in 2D, 1/2 in 3D — core.ops3d) — the
    single test that would have caught the reference's (1/16)=0
    restriction bug."""
    rng = rng or np.random.default_rng(0)
    Sf, Sc, nc = nf + 1, nf // 2 + 1, nf // 2
    r = np.zeros((Sf,) * ndim)
    r[(slice(1, nf),) * ndim] = rng.standard_normal((nf - 1,) * ndim)
    e = np.zeros((Sc,) * ndim)
    e[(slice(1, nc),) * ndim] = rng.standard_normal((nc - 1,) * ndim)
    rj, ej = jnp.asarray(r, jnp.float32), jnp.asarray(e, jnp.float32)
    if ndim == 3:
        from ..core import ops3d
        lhs = float(jnp.vdot(ops3d.restrict_fw3(rj, nf, Sc), ej))
        rhs = 0.5 * float(jnp.vdot(rj, ops3d.prolong3(ej, nc, Sf)))
    else:
        lhs = float(jnp.vdot(ops.restrict_fw(rj, nf, Sc), ej))
        rhs = float(jnp.vdot(rj, ops.prolong(ej, nc, Sf)))
    if abs(lhs - rhs) > 1e-4 * (abs(lhs) + abs(rhs) + 1e-30):
        raise AssertionError(f"R != c*P^T: <Rr,e>={lhs} != c<r,Pe>={rhs}")
    if abs(lhs) < 1e-20:
        raise AssertionError("restriction output is identically zero")

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
    """Assert the padded-grid invariants: 2D square, finite, and zero
    outside the interior."""
    u = np.asarray(u)
    if u.ndim != 2 or u.shape[0] != u.shape[1]:
        raise AssertionError(f"{name}: expected square 2D grid, got {u.shape}")
    if u.shape[0] < n + 1:
        raise AssertionError(f"{name}: S={u.shape[0]} < n+1={n + 1}")
    if not np.all(np.isfinite(u)):
        raise AssertionError(f"{name}: non-finite values present")
    mask = np.zeros(u.shape, bool)
    mask[1:n, 1:n] = True
    bad = np.abs(u[~mask]).max() if (~mask).any() else 0.0
    if bad != 0.0:
        raise AssertionError(
            f"{name}: zero-outside-interior invariant violated (max |.| = "
            f"{bad:.3e} on boundary/padding)")


def check_operator(op, rng=None) -> None:
    """Operator sanity: symmetry, positive diagonal, masked output, and a
    nonzero action (the reference's zeroed restriction would fail here)."""
    rng = rng or np.random.default_rng(0)
    n, S = op.n, op.S
    x = np.zeros((S, S)); x[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    y = np.zeros((S, S)); y[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
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


def check_transfer_pair(nf: int = 16, rng=None) -> None:
    """R = P^T adjointness — the single test that would have caught the
    reference's (1/16)=0 restriction bug."""
    rng = rng or np.random.default_rng(0)
    Sf, Sc, nc = nf + 1, nf // 2 + 1, nf // 2
    r = np.zeros((Sf, Sf)); r[1:nf, 1:nf] = rng.standard_normal((nf - 1, nf - 1))
    e = np.zeros((Sc, Sc)); e[1:nc, 1:nc] = rng.standard_normal((nc - 1, nc - 1))
    rj, ej = jnp.asarray(r, jnp.float32), jnp.asarray(e, jnp.float32)
    lhs = float(jnp.vdot(ops.restrict_fw(rj, nf, Sc), ej))
    rhs = float(jnp.vdot(rj, ops.prolong(ej, nc, Sf)))
    if abs(lhs - rhs) > 1e-4 * (abs(lhs) + abs(rhs) + 1e-30):
        raise AssertionError(f"R != P^T: <Rr,e>={lhs} != <r,Pe>={rhs}")
    if abs(lhs) < 1e-20:
        raise AssertionError("restriction output is identically zero")

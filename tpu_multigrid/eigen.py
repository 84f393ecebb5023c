"""Smallest-eigenpair solver: inverse power iteration with multigrid.

A library showcase the reference cannot express: each inverse-iteration
step solves ``A w = v`` with a fixed budget of multigrid cycles, all
inside ONE jitted ``fori_loop`` — no host round-trips.  In the
framework's h-independent scaling ``A = h^2 (-lap)``, so the continuous
eigenvalue is the Rayleigh quotient divided by ``h^2``; for the unit
square/cube Dirichlet Laplacian the smallest eigenvalue is ``d pi^2``
(d = 2, 3), recovered to O(h^2).

Works for any SPD operator family in the framework (Poisson, variable
diffusion, anisotropic/rotated tensors, reaction shifts, Mehrstellen).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import MultigridConfig
from .core import ops
from .core.grids import Hierarchy
from .cycles import _zeros, cycle


def smallest_eigenpair(hier: Hierarchy, cfg: MultigridConfig, *,
                       iters: int = 25, inner_cycles: int = 6):
    """(lam, v, history): the smallest eigenvalue of the CONTINUOUS
    operator (Rayleigh quotient / h^2), its grid eigenfunction
    (normalized), and the per-iteration eigenvalue history.

    ``inner_cycles`` multigrid cycles approximate each inverse-iteration
    solve; with multigrid's ~0.1 reduction factor, 5-6 cycles push the
    solver error far below the eigenvalue gap per step.
    """
    op = hier.levels[0]
    n = op.n
    h2 = (1.0 / n) ** 2

    # Deterministic symmetric start with a nonzero overlap with the
    # ground mode: the interior indicator.
    v0 = _zeros(op, jnp.dtype(cfg.dtype))
    inter = tuple(slice(1, n) for _ in range(getattr(op, "ndim", 2)))
    v0 = v0.at[inter].set(1.0)
    v0 = v0 / ops.norm2(v0)

    def body(i, carry):
        v, hist = carry
        w = _zeros(op, v.dtype)
        for _ in range(inner_cycles):
            w = cycle(hier, cfg, w, v)
        w = w / ops.norm2(w).astype(w.dtype)
        lam = (jnp.sum(w * op.apply(w))
               / jnp.maximum(jnp.sum(w * w), 1e-300)) / h2
        hist = hist.at[i].set(lam.astype(jnp.float32))
        return w, hist

    hist0 = jnp.full((iters,), jnp.nan, jnp.float32)
    v, hist = jax.lax.fori_loop(0, iters, body, (v0, hist0))
    return hist[iters - 1], v, hist

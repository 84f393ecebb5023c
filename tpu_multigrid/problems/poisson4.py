"""Fourth-order compact (Mehrstellen) Poisson discretization.

Extension beyond the second-order-only reference: the classical
Mehrstellenverfahren replaces the 5-point stencil with the compact
9-point stencil and a smoothed right-hand side,

    (1/6) [[-1, -4, -1],           h^2
           [-4, 20, -4],  u  =  ------- [[0, 1, 0], [1, 8, 1], [0, 1, 0]] f
           [-1, -4, -1]]           12

which is O(h^4)-accurate for -lap(u) = f with smooth f — two extra
orders for the same O(n^2) work per sweep, still on a compact stencil
(no wide halos, so every transfer/masking invariant of the framework
holds unchanged).

The operator is h-independent in this framework's scaling (stencil x
h^2), so every level re-discretizes to the SAME stencil — like the
5-point Poisson hierarchy — and the operator is matrix-free
(:class:`core.operators.Const9Op`: ~zero setup memory, vs 9 (S, S)
coefficient planes for a VarStencilOp at 8193^2 = 2.4 GB).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Union

import jax.numpy as jnp

from ..config import MultigridConfig
from ..core import ops
from ..core.grids import Hierarchy, coarse_dense_inverse, level_sizes
from ..core.operators import Const9Op


def mehrstellen_rhs(n: int, S: int, forcing: Union[float, Callable],
                    dtype=jnp.float32) -> jnp.ndarray:
    """RHS  h^2 * B f  with  B = [[0,1,0],[1,8,1],[0,1,0]] / 12.

    For constant f, B f = f exactly (B has unit row sum), matching
    ``problems.poisson.poisson_rhs``.
    """
    h2 = (1.0 / n) ** 2
    if callable(forcing):
        from ..core.grids import node_coordinates
        x, y = node_coordinates(n, S, dtype)
        f = forcing(x, y).astype(dtype)
        bf = (8.0 * f + jnp.roll(f, 1, -2) + jnp.roll(f, -1, -2)
              + jnp.roll(f, 1, -1) + jnp.roll(f, -1, -1)) / 12.0
        # wrap-around rows/cols land outside the interior (masked); f
        # itself is evaluated on the true node coordinates, so interior
        # nodes always read true neighbor values of f.
        vals = bf.astype(dtype) * jnp.asarray(h2, dtype)
    else:
        vals = jnp.full((S, S), float(forcing) * h2, dtype)
    return ops.mask_interior(vals, n)


def mehrstellen_var_op(n: int, S: int, dtype=jnp.float32):
    """The Mehrstellen stencil as a :class:`VarStencilOp` (constant
    planes) — the operator-general DISTRIBUTION vehicle: a ``(n, S) ->
    VarStencilOp`` factory for ``dist.shard_cycle.sharded_solve
    (operator=..., operator_coarsening="rediscretize")``.  Single-chip
    solves keep the matrix-free :class:`Const9Op` (zero stored planes);
    the distributed tier pays the 9 coefficient planes to ride the
    generic shard-local 9-point machinery (dist/local_var.py).
    """
    import numpy as np

    from ..core.operators import VarStencilOp

    dt = np.dtype(jnp.dtype(dtype).name)
    coef = np.zeros((3, 3, S, S), np.float64)
    coef[1, 1] = 20.0 / 6.0
    for di, dj in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        coef[1 + di, 1 + dj] = -4.0 / 6.0
    for di, dj in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
        coef[1 + di, 1 + dj] = -1.0 / 6.0
    i = np.arange(S)
    mrow = (i >= 1) & (i <= n - 1)
    m = mrow[:, None] & mrow[None, :]
    coef = np.where(m[None, None], coef, 0.0)
    inv_diag = np.where(m, 6.0 / 20.0, 0.0)
    return VarStencilOp(coef.astype(dt), inv_diag.astype(dt), n, S)


def build_mehrstellen_hierarchy(config: MultigridConfig, *, align: int = 1,
                                min_pad_level: int = 99) -> Hierarchy:
    """Per-level Mehrstellen hierarchy (h-independent: identical stencil
    every level, matrix-free)."""
    sizes = level_sizes(config, align=align, min_pad_level=min_pad_level)
    levels = tuple(Const9Op(n, S) for n, S in sizes)
    coarse_inv = None
    if config.coarse_solver == "direct":
        coarse_inv = coarse_dense_inverse(levels[-1])
    return Hierarchy(levels, coarse_inv)


@dataclasses.dataclass
class Poisson4Problem:
    """-lap(u) = forcing at fourth order (compact Mehrstellen stencil)."""

    config: MultigridConfig
    forcing: Union[float, Callable] = 4.0
    align: int = 1
    min_pad_level: int = 99

    def __post_init__(self):
        self.hierarchy: Hierarchy = build_mehrstellen_hierarchy(
            self.config, align=self.align,
            min_pad_level=self.min_pad_level)

    @property
    def finest(self):
        return self.hierarchy.levels[0]

    def rhs(self, dtype=None) -> jnp.ndarray:
        op = self.finest
        dt = dtype if dtype is not None else self.config.dtype
        return mehrstellen_rhs(op.n, op.S, self.forcing, dt)

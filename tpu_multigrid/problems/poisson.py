"""2D Poisson problem on the unit square, homogeneous Dirichlet BCs.

The reference solves -div(grad u) = 4 with P1 triangular elements on the unit
square (constants at ``Poissons_SYCL.cpp:119-123``); its host-side two-sweep
COO assembly (``globalforcefunction``, ``:283-335``) reduces on this mesh to
the closed form b = f * h^2 at every interior node (six triangles of area
h^2/2 each contribute f*area/3, ``force_function_element``, ``:175-186``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Union

import jax.numpy as jnp

from ..config import MultigridConfig
from ..core import ops
from ..core.grids import (Hierarchy, build_poisson_hierarchy,
                          node_coordinates)


def poisson_rhs(n: int, S: int, f: Union[float, Callable] = 4.0,
                dtype=jnp.float32) -> jnp.ndarray:
    """FEM load vector as a padded (S, S) grid: b = f(x, y) * h^2, interior.

    ``f`` may be the constant forcing (reference default 4.0,
    ``Poissons_SYCL.cpp:121``) or a callable ``f(x, y)`` evaluated at nodes.
    """
    h2 = (1.0 / n) ** 2
    if callable(f):
        x, y = node_coordinates(n, S, dtype)
        vals = f(x, y).astype(dtype) * h2
    else:
        vals = jnp.full((S, S), float(f) * h2, dtype)
    return ops.mask_interior(vals, n)


def boundary_grid(n: int, S: int, g: Union[float, Callable],
                  dtype=jnp.float32) -> jnp.ndarray:
    """(S, S) grid holding the Dirichlet boundary values ``g`` on the
    physical boundary nodes (i or j in {0, n}) and zeros elsewhere.

    Used for inhomogeneous Dirichlet lifting: the reference supports only
    homogeneous BCs (it eliminates boundary rows/cols outright,
    ``Poissons_SYCL.cpp:224,263``); here ``u = w + G`` with ``w`` solving
    the homogeneous problem ``A w = b - A G`` — no operator or kernel
    changes, one extra stencil apply at setup.
    """
    if callable(g):
        x, y = node_coordinates(n, S, dtype)
        vals = g(x, y).astype(dtype)
    else:
        vals = jnp.full((S, S), float(g), dtype)
    i = jnp.arange(S)
    on_edge = (i == 0) | (i == n)
    in_range = (i >= 0) & (i <= n)
    m = (on_edge[:, None] & in_range[None, :]) | \
        (in_range[:, None] & on_edge[None, :])
    return jnp.where(m, vals, jnp.zeros((), dtype))


@dataclasses.dataclass
class PoissonProblem:
    """Front-door problem object: hierarchy + per-level RHS assembly."""

    config: MultigridConfig
    forcing: Union[float, Callable] = 4.0
    align: int = 1
    min_pad_level: int = 99

    def __post_init__(self):
        self.hierarchy: Hierarchy = build_poisson_hierarchy(
            self.config, align=self.align, min_pad_level=self.min_pad_level)

    @property
    def finest(self):
        return self.hierarchy.levels[0]

    def rhs(self, level_index: int = 0, dtype=None) -> jnp.ndarray:
        op = self.hierarchy.levels[level_index]
        dt = dtype if dtype is not None else self.config.dtype
        return poisson_rhs(op.n, op.S, self.forcing, dt)

    def rhs_all_levels(self, dtype=None):
        """Per-level assembled RHS (for fmg_rhs="assemble",
        reference v2 semantics, Multigrid_functions.cpp:184)."""
        return [self.rhs(k, dtype) for k in range(self.hierarchy.num_levels)]

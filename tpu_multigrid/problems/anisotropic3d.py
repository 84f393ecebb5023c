"""3D anisotropic Poisson via semi-coarsened multigrid.

``-(eps_x u_xx + eps_y u_yy + eps_z u_zz) = f`` on the unit cube with
homogeneous Dirichlet BCs.  The robust configuration at strong anisotropy
is the coupling-balanced semi-coarsened hierarchy (core.semicoarsen3) with
plain point smoothing — the 3D analogue of the 2D
``AnisotropicPoissonProblem(coarsening="semi")``; mild anisotropy can also
run the standard full-coarsening variable-coefficient tier
(``solve_diffusion3d``-family machinery).

Extension beyond the isotropic-only reference
(``Poissons_SYCL.cpp:119-123``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Union

import jax.numpy as jnp

from ..config import MultigridConfig
from ..core.grids import Hierarchy
from ..core.semicoarsen3 import _box_mask3, build_semicoarsened_hierarchy3


@dataclasses.dataclass
class AnisotropicPoisson3DProblem:
    config: MultigridConfig
    eps_x: float = 1.0
    eps_y: float = 1.0
    eps_z: float = 1.0
    forcing: Union[float, Callable] = 6.0
    balance: float = 2.0

    def __post_init__(self):
        self.hierarchy: Hierarchy = build_semicoarsened_hierarchy3(
            self.config, self.eps_x, self.eps_y, self.eps_z, self.balance)

    @property
    def finest(self):
        return self.hierarchy.levels[0]

    def rhs(self, dtype=None) -> jnp.ndarray:
        op = self.finest
        n = op.nz
        dt = dtype if dtype is not None else self.config.dtype
        h2 = (1.0 / n) ** 2
        shape = op.grid_shape
        if callable(self.forcing):
            import jax
            h = 1.0 / n
            gz = jnp.arange(shape[0], dtype=dt) * h
            gy = jnp.arange(shape[1], dtype=dt) * h
            gx = jnp.arange(shape[2], dtype=dt) * h
            z = gz[:, None, None]
            y = gy[None, :, None]
            x = gx[None, None, :]
            vals = (self.forcing(x, y, z) * h2).astype(dt)
            vals = jnp.broadcast_to(vals, shape)
        else:
            vals = jnp.full(shape, float(self.forcing) * h2, dt)
        m = _box_mask3(shape, op.box)
        return jnp.where(m, vals, jnp.zeros((), dt))

#!/usr/bin/env python
"""Variable-coefficient diffusion with Galerkin coarse operators.

Solves -div(a(x, y) grad u) = 4 with a smooth high-contrast coefficient
bump, validating against the scipy oracle on CPU-sized grids.
"""

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tpu_multigrid as mg
from tpu_multigrid import oracle
from tpu_multigrid.problems.diffusion import cell_coefficients

LEVEL = 7
n = 2 ** LEVEL

a_jnp = lambda x, y: 1.0 + 10.0 * jnp.exp(-((x - .5) ** 2 + (y - .5) ** 2) * 8)
a_np = lambda x, y: 1.0 + 10.0 * np.exp(-((x - .5) ** 2 + (y - .5) ** 2) * 8)

cfg = mg.MultigridConfig(finest_level=LEVEL, coarsest_level=3,
                         smoother="rbgs", nu1=1, nu2=1, dtype=jnp.float32)
result = mg.solve_diffusion(LEVEL, coefficient=a_jnp, config=cfg, tol=1e-3)
u = np.asarray(mg.extract_solution(result.u, n))
print(f"converged={bool(result.converged)} in {int(result.iterations)} cycles")

cells = np.asarray(cell_coefficients(n, a_np, np.float64))
uo = oracle.solve_diffusion_oracle(n, cells)
rel = np.linalg.norm(u - uo) / np.linalg.norm(uo)
print(f"rel L2 vs scipy sparse direct solve: {rel:.3e}")

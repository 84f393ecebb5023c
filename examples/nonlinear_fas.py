"""Nonlinear multigrid (FAS): the Bratu problem and quasilinear diffusion.

1. Bratu  −Δu − λ eᵘ = 0  at λ = 5 (lower solution branch) — FAS V-cycles
   converge at the same h-independent rate as linear multigrid, with NO
   outer Newton loop and no global linearization.
2. Quasilinear diffusion  −∇·((1 + γu²)∇u) = f  with an FMG-FAS
   (nested iteration) head start.

Run: python examples/nonlinear_fas.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tpu_multigrid import (MultigridConfig, solve_bratu,
                           solve_quasilinear_diffusion)

LEVEL = 6

print(f"== Bratu -lap(u) - 5 e^u = 0, level {LEVEL} "
      f"({2**LEVEL + 1}^2 nodes) ==")
cfg = MultigridConfig(finest_level=LEVEL, coarsest_level=2,
                      dtype=jnp.float64)
res = solve_bratu(LEVEL, lam=5.0, config=cfg, tol=1e-10)
hist = np.asarray(res.res_history)
iters = int(res.iterations)
print(f"converged={bool(res.converged)} in {iters} FAS V-cycles; "
      f"per-cycle rate {(hist[iters] / hist[0]) ** (1 / iters):.3f}")
print(f"u(center) = {float(res.u[2**(LEVEL-1), 2**(LEVEL-1)]):.6f}")

print(f"\n== quasilinear -div((1 + 2u^2) grad u) = 8, FMG-FAS ==")
res = solve_quasilinear_diffusion(LEVEL, gamma=2.0, forcing=8.0,
                                  tol=1e-10, use_fmg=True,
                                  config=MultigridConfig(
                                      finest_level=LEVEL, coarsest_level=2,
                                      dtype=jnp.float64,
                                      coarse_solver="smooth",
                                      coarse_smooth_sweeps=60))
hist = np.asarray(res.res_history)
print(f"converged={bool(res.converged)} in {int(res.iterations)} cycles "
      f"after the FMG start (initial nonlinear residual {hist[0]:.3e})")

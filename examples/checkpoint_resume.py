#!/usr/bin/env python
"""Checkpoint a partially converged solve and resume it."""

import tempfile

import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid import MultigridConfig, PoissonProblem, solve_until_tol
from tpu_multigrid.utils import restore_solve, save_state
from tpu_multigrid.utils.checkpoint import state_from_result

cfg = MultigridConfig(finest_level=7, coarsest_level=3, dtype=jnp.float32)
prob = PoissonProblem(cfg)
b = prob.rhs()

partial = solve_until_tol(prob.hierarchy, cfg, b, tol=3e-4, max_cycles=3)
print(f"interrupted after {int(partial.iterations)} cycles, "
      f"converged={bool(partial.converged)}")

path = tempfile.mktemp(suffix=".npz")
save_state(path, state_from_result(partial, cfg.finest_level))
print(f"checkpointed to {path}")

resumed = restore_solve(path, prob.hierarchy, cfg, b, tol=3e-4,
                        max_cycles=40)
print(f"resumed: +{int(resumed.iterations)} cycles, "
      f"converged={bool(resumed.converged)}")

#!/usr/bin/env python
"""Distributed solve over a 2D device mesh with explicit halo exchange.

On a machine with one device this still runs (1x1 mesh); to exercise real
sharding without hardware:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed_solve.py
(and call jax.config.update("jax_platforms", "cpu") below if the
environment pins another backend).
"""

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid import MultigridConfig
from tpu_multigrid.dist.mesh import make_grid_mesh
from tpu_multigrid.dist.shard_cycle import sharded_solve

mesh = make_grid_mesh()   # all visible devices, most-square (gy, gx)
print(f"mesh: {mesh.devices.shape} over {mesh.devices.size} device(s)")

cfg = MultigridConfig(finest_level=8, coarsest_level=3, dtype=jnp.float32)
result, levels = sharded_solve(cfg, mesh, tol=1e-3, max_cycles=30)

print(f"levels: {levels.sizes} ({levels.num_sharded} shard-local, "
      f"rest replicated)")
iters = int(result.iterations)
hist = np.asarray(result.res_history)[: iters + 1]
print(f"converged={bool(result.converged)} in {iters} cycles; "
      f"|r|: {hist[0]:.3e} -> {hist[-1]:.3e}")

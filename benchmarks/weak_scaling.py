#!/usr/bin/env python
"""Weak-scaling sweep over a 2D device mesh (BASELINE config 5 machinery).

Fixed per-device load: each mesh doubling doubles the global grid area, so
perfect weak scaling keeps time/cycle constant.  With one physical TPU chip
in this environment, run it on virtual CPU devices to exercise the sweep and
the halo-exchange wiring end-to-end:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/weak_scaling.py

(CPU timings are not TPU-representative; on a real v5e-4 slice the same
script measures the true weak-scaling curve.)
"""

import argparse
import time

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# This environment's sitecustomize force-selects the TPU tunnel backend;
# an explicit JAX_PLATFORMS=cpu in the env must win here (CLAUDE.md).
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tpu_multigrid import MultigridConfig
from tpu_multigrid.dist.mesh import make_grid_mesh
from tpu_multigrid.dist.shard_cycle import sharded_solve


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base-level", type=int, default=7,
                   help="finest level on 1 device; each 4x devices adds 1")
    p.add_argument("--cycles", type=int, default=4)
    p.add_argument("--pallas", action="store_true",
                   help="fused-Pallas sharded path (dist.pallas_cycle); on "
                        "CPU it runs in interpret mode")
    args = p.parse_args()

    devs = jax.devices()
    print(f"{len(devs)} device(s): {devs[0].platform}")
    print(f"{'mesh':>8} {'grid':>12} {'cycles':>7} {'|r| reduction':>14} "
          f"{'s/cycle':>9}")

    configs = []
    nd = 1
    lvl = args.base_level
    while nd <= len(devs):
        my = int(np.sqrt(nd))
        while nd % my:
            my -= 1
        configs.append(((my, nd // my), lvl))
        nd *= 4
        lvl += 1

    for mesh_shape, lvl in configs:
        my, mx = mesh_shape
        mesh = make_grid_mesh(shape=mesh_shape, devices=devs[: my * mx])
        cfg = MultigridConfig(finest_level=lvl, coarsest_level=3,
                              dtype=jnp.float32)
        t0 = time.perf_counter()
        if args.pallas:
            import contextlib
            from jax.experimental.pallas import tpu as pltpu
            from tpu_multigrid.dist.pallas_cycle import sharded_solve_pallas
            interp = (pltpu.force_tpu_interpret_mode()
                      if devs[0].platform == "cpu" else contextlib.nullcontext())
            with interp:
                res, levels = sharded_solve_pallas(
                    cfg, mesh, num_cycles=args.cycles, tol=0.0,
                    replicate_below=64)
        else:
            res, levels = sharded_solve(cfg, mesh, num_cycles=args.cycles,
                                        tol=0.0, replicate_below=16)
        hist = np.asarray(res.res_history)
        wall = time.perf_counter() - t0
        n = 2 ** lvl
        red = hist[args.cycles] / hist[0]
        print(f"{str(mesh_shape):>8} {f'{n+1}x{n+1}':>12} "
              f"{args.cycles:>7} {red:>14.3e} "
              f"{wall / args.cycles:>9.3f}")


if __name__ == "__main__":
    main()

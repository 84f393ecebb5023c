#!/usr/bin/env python
"""3D weak-scaling sweep on virtual CPU meshes (config-5 analogue for the
cube): fixed per-device block, growing (gz, gy) mesh, one fixed-count
distributed solve per point.  Real multi-chip hardware is unavailable in
this environment (CLAUDE.md) — this validates the machinery and records
the level splits; absolute times are CPU-emulation numbers only.

Usage: python benchmarks/weak_scaling3.py [--block 32] [--cycles 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--block", type=int, default=32,
                   help="owned block edge per device (z and y)")
    p.add_argument("--cycles", type=int, default=2)
    args = p.parse_args()

    meshes = [(1, 1), (1, 2), (2, 2), (2, 4)]
    ndev = max(mz * my for mz, my in meshes)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={ndev}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tpu_multigrid import MultigridConfig
    from tpu_multigrid.dist.shard_cycle3 import (make_grid_mesh3,
                                                 sharded_solve3)

    print(f"# 3D weak scaling: block {args.block}^2 x S per device, "
          f"{args.cycles} V-cycles, jnp halo-exchange path", flush=True)
    for mz, my in meshes:
        S_target = args.block * max(mz, my)
        level = max(3, int(np.ceil(np.log2(S_target))))
        cfg = MultigridConfig(finest_level=level, coarsest_level=2,
                              smoother="chebyshev", nu1=3, nu2=2)
        mesh = make_grid_mesh3(shape=(mz, my),
                               devices=jax.devices()[: mz * my])
        t0 = time.time()
        res, levels = sharded_solve3(cfg, mesh, num_cycles=args.cycles,
                                     tol=0.0, replicate_below=4)
        jax.block_until_ready(res.u)
        h = np.asarray(res.res_history)
        print(f"mesh {mz}x{my}: n={2**level} levels={levels.sizes} "
              f"({levels.num_sharded} sharded) "
              f"|r| {h[0]:.2e}->{h[args.cycles]:.2e} "
              f"wall {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()

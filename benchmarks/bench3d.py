#!/usr/bin/env python
"""3D V-cycle benchmark on the real chip (fused K1₃/K2₃ path).

Prints per-configuration V-cycle times via the two-point fori_loop slope
(tunnel-proof, see bench.py) and the DOF/s figure.  Usage:

    python benchmarks/bench3d.py --level 8 [--no-pallas] [--cycles 2]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid import MultigridConfig          # noqa: E402
from tpu_multigrid.problems import Poisson3DProblem  # noqa: E402
from tpu_multigrid import cycles                   # noqa: E402


def vcycle_time(hier, cfg, u0, b, n1=2, n2=12, reps=4):
    def make(iters):
        @jax.jit
        def run(hier, uu, bb):
            out = jax.lax.fori_loop(
                0, iters, lambda i, s: cycles.cycle(hier, cfg, s, bb), uu)
            return out[1, 1, 1] + out[2, 2, 2]
        return run
    r1, r2 = make(n1), make(n2)
    float(r1(hier, u0, b))
    float(r2(hier, u0, b))
    # Median slope: min over noisy (t2 - t1) differences is biased low
    # (see bench.py).
    slopes = []
    for _ in range(reps):
        t1 = time.perf_counter(); float(r1(hier, u0, b))
        t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); float(r2(hier, u0, b))
        t2 = time.perf_counter() - t2
        slopes.append((t2 - t1) / (n2 - n1))
    return sorted(slopes)[len(slopes) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=8)
    p.add_argument("--coarsest", type=int, default=4)
    p.add_argument("--nu1", type=int, default=3)
    p.add_argument("--nu2", type=int, default=2)
    p.add_argument("--no-pallas", action="store_true")
    args = p.parse_args()

    n = 2 ** args.level
    cfg = MultigridConfig(finest_level=args.level,
                          coarsest_level=args.coarsest,
                          smoother="chebyshev", nu1=args.nu1, nu2=args.nu2,
                          dtype=jnp.float32,
                          use_pallas=not args.no_pallas)
    prob = Poisson3DProblem(cfg, align=16, min_pad_level=0, lane_align=128)
    hier, b = prob.hierarchy, prob.rhs()
    u0 = jnp.zeros_like(b)
    print(f"# 3D level {args.level} ({n + 1}^3 nodes), shapes "
          f"{[op.grid_shape for op in hier.levels]}, "
          f"device={jax.devices()[0]}", flush=True)
    dt = vcycle_time(hier, cfg, u0, b)
    dof = (n - 1) ** 3
    print(f"vcycle_ms {dt * 1e3:.3f}  dof_per_sec {dof / dt:.3e}  "
          f"pallas={cfg.use_pallas}")


if __name__ == "__main__":
    main()

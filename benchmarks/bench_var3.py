#!/usr/bin/env python
"""On-chip A/B: 3D variable-coefficient V-cycle, fused K1v₃/K2v₃ vs jnp.

The 2D var tier measured 7.40 ms fused vs 9.18 ms unfused at 4097²
(kernels/vartransfer.py); this is the 3D analogue's same-session check.
Slope timing with scalar readback (CLAUDE.md: block_until_ready does not
synchronize through the tunnel).

Usage: python benchmarks/bench_var3.py [level=8] [shift=0]
"""

import os
import sys
import time
import dataclasses

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

try:
    from tpu_multigrid.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid import MultigridConfig
from tpu_multigrid.cycles import cycle, _use_var_super_kernels3
from tpu_multigrid.problems.diffusion3d import Diffusion3DProblem


def time_cycles(hier, cfg, b, n1=2, n2=10, reps=3):
    op = hier.levels[0]
    u0 = jnp.zeros(op.grid_shape, cfg.dtype)

    def make(k):
        @jax.jit
        def run(h, u, bb):
            out = jax.lax.fori_loop(
                0, k, lambda i, v: cycle(h, cfg, v, bb), u)
            return out.ravel()[1] + out.ravel()[2]
        return run

    r1, r2 = make(n1), make(n2)
    t0 = time.perf_counter()
    float(r1(hier, u0, b)); float(r2(hier, u0, b))
    compile_s = time.perf_counter() - t0
    slopes = []
    for _ in range(reps):
        t1 = time.perf_counter(); float(r1(hier, u0, b))
        t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); float(r2(hier, u0, b))
        t2 = time.perf_counter() - t2
        slopes.append((t2 - t1) / (n2 - n1))
    return sorted(slopes)[len(slopes) // 2] * 1e3, compile_s


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    shift = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    cfg = MultigridConfig(finest_level=level, coarsest_level=3,
                          smoother="chebyshev", nu1=3, nu2=2,
                          use_pallas=True)
    prob = Diffusion3DProblem(
        cfg, coefficient=lambda x, y, z: 1.0 + x + 2.0 * y + z,
        shift=shift, align=16, min_pad_level=0, lane_align=128)
    op, opc = prob.hierarchy.levels[0], prob.hierarchy.levels[1]
    print(f"# device={jax.devices()[0]} level={level} "
          f"shape={op.grid_shape} shift={shift} "
          f"fused_gate={_use_var_super_kernels3(op, opc, cfg, jnp.float32)}",
          flush=True)
    b = prob.rhs()
    for name, c in (("fused K1v3/K2v3", cfg),
                    ("jnp", dataclasses.replace(cfg, use_pallas=False))):
        ms, cs = time_cycles(prob.hierarchy, c, b)
        print(f"{name:18s} {ms:9.3f} ms/V-cycle (compile {cs:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()

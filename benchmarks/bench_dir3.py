#!/usr/bin/env python
"""On-chip A/B: 3D VARIABLE-WIND upwind convection, fused directional
K1v₃/K2v₃ (6-plane streaming) vs jnp.  VERDICT r4 next #1.

The 2D 9-plane nonsym tier measured 4.3x over jnp at 4097²
(bench_nonsym); this is the 3D analogue's same-session check at 257³.
Also times BiCGStab wrapped around the fused-preconditioner V-cycle
(krylov riding the fused operator).  Slope timing with scalar readback
(CLAUDE.md: block_until_ready does not synchronize through the tunnel).

Usage: python benchmarks/bench_dir3.py [level=8]
"""

import os
import sys
import time
import dataclasses
import math

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

try:
    from tpu_multigrid.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid import MultigridConfig
from tpu_multigrid.cycles import cycle, _use_var_super_kernels3
from tpu_multigrid.problems.convection3d import (
    ConvectionDiffusion3DProblem)


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


# Recirculating variable winds, O(1), sign changes inside the domain:
# genuinely nonseparable, so no constant-stencil shortcut applies.
WINDS = dict(
    bx=lambda x, y, z: jnp.sin(2 * math.pi * x) * (0.5 + z),
    by=lambda x, y, z: jnp.cos(2 * math.pi * y) - 0.3,
    bz=lambda x, y, z: x - y,
)


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(f"# device={jax.devices()[0]} level={level} "
          f"({2**level+1}^3)", flush=True)

    cfgp = MultigridConfig(finest_level=level, coarsest_level=3,
                           smoother="rbgs", nu1=2, nu2=2,
                           use_pallas=True)
    prob = ConvectionDiffusion3DProblem(cfgp, eps=0.01, **WINDS,
                                        align=16, min_pad_level=0,
                                        lane_align=128)
    hier = jax.device_put(prob.hierarchy)
    b = prob.rhs()
    op0, op1 = hier.levels[0], hier.levels[1]
    assert op0.STENCIL27 is None and op0.coef_stack is not None
    print(f"# fused gate at finest pair: "
          f"{_use_var_super_kernels3(op0, op1, cfgp, jnp.float32)}",
          flush=True)

    cfgj = dataclasses.replace(cfgp, use_pallas=False)
    ms_j, cs_j = time_cycles(hier, cfgj, b)
    print(f"jnp   V-cycle: {ms_j:8.3f} ms (compile {cs_j:.1f}s)",
          flush=True)
    ms_f, cs_f = time_cycles(hier, cfgp, b)
    print(f"fused V-cycle: {ms_f:8.3f} ms (compile {cs_f:.1f}s)  "
          f"-> {ms_j/ms_f:.2f}x", flush=True)

    # convergence sanity on-chip: fused until-tol vs jnp, same tolerance
    from tpu_multigrid.cycles import solve_until_tol
    for name, cfg in (("jnp", cfgj), ("fused", cfgp)):
        t0 = time.perf_counter()
        res = jax.jit(lambda h, bb, c=cfg: solve_until_tol(
            h, c, bb, tol=1e-6, max_cycles=40))(hier, b)
        it = int(res.iterations)
        rn = float(jnp.sqrt(jnp.sum(
            op0.residual(res.u, b).astype(jnp.float32) ** 2)))
        print(f"{name:5s} until-tol 1e-6: {it} cycles, |r|={rn:.3e} "
              f"(wall {time.perf_counter()-t0:.1f}s incl compile)",
              flush=True)

    # BiCGStab riding the fused-preconditioner cycle
    from tpu_multigrid.krylov import bicgstab_solve
    for name, cfg in (("jnp", cfgj), ("fused", cfgp)):
        t0 = time.perf_counter()
        res = bicgstab_solve(hier, cfg, b, tol=1e-8, max_iters=30)
        jax.block_until_ready(res.u)
        rn = float(jnp.sqrt(jnp.sum(
            op0.residual(res.u, b).astype(jnp.float32) ** 2)))
        print(f"bicgstab[{name:5s}]: {int(res.iterations)} iters, "
              f"|r|={rn:.3e} "
              f"(wall {time.perf_counter()-t0:.1f}s incl compile)",
              flush=True)


if __name__ == "__main__":
    main()

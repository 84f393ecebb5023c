#!/usr/bin/env python
"""Nonsymmetric (9-plane) fused-tier A/B (VERDICT r3 next #3).

Upwind convection-diffusion V-cycles at 4097^2: the r4 9-plane storage
variant lets the nonsymmetric operator ride K1v/K2v (the r3
``is_symmetric`` bail is gone).  Same-session A/B on the SAME padded
hierarchy (align=256), config differing only in ``use_pallas``.  Slope
timing with scalar readback (CLAUDE.md: block_until_ready does not sync
on the tunneled device).

Usage: python benchmarks/bench_nonsym.py [--level 12] [--cycles 8]
"""

import argparse
import os
import sys
import time

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
from tpu_multigrid.cycles import _var_kernel_ok, cycle
from tpu_multigrid.problems import ConvectionDiffusionProblem


def _slope(run1, run2, n1, n2, repeats):
    t0 = time.perf_counter()
    float(run1()); float(run2())
    compile_s = time.perf_counter() - t0
    slopes = []
    for _ in range(repeats):
        t1 = time.perf_counter(); float(run1())
        t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); float(run2())
        t2 = time.perf_counter() - t2
        slopes.append((t2 - t1) / (n2 - n1))
    return sorted(slopes)[len(slopes) // 2] * 1e3, compile_s


def bench_cycles(hier, cfg, b, cycles, repeats):
    hier = jax.device_put(hier)
    op = hier.levels[0]
    u0 = jnp.zeros((op.S, op.S), cfg.dtype)

    def make(k):
        @jax.jit
        def run(h, u, bb):
            out = jax.lax.fori_loop(
                0, k, lambda i, v: cycle(h, cfg, v, bb), u)
            return out[1, 1] + out[2, 2]
        return run

    c1, c2 = max(cycles // 4, 1), cycles
    r1, r2 = make(c1), make(c2)
    return _slope(lambda: r1(hier, u0, b), lambda: r2(hier, u0, b),
                  c1, c2, repeats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=12)
    p.add_argument("--cycles", type=int, default=8)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--smoother", default="rbgs")
    p.add_argument("--nu", type=int, default=2)
    p.add_argument("--eps", type=float, default=0.001)
    args = p.parse_args()

    cfg_p = MultigridConfig(finest_level=args.level, coarsest_level=5,
                            smoother=args.smoother, nu1=args.nu,
                            nu2=args.nu, use_pallas=True)
    cfg_j = MultigridConfig(finest_level=args.level, coarsest_level=5,
                            smoother=args.smoother, nu1=args.nu,
                            nu2=args.nu, use_pallas=False)
    print(f"# device={jax.devices()[0]} level={args.level} "
          f"{args.smoother}({args.nu},{args.nu}) eps={args.eps} "
          f"(mesh Peclet ~ {1.0 / (args.eps * 2 ** args.level):.1f})",
          flush=True)
    t0 = time.perf_counter()
    prob = ConvectionDiffusionProblem(cfg_p, eps=args.eps, bx=1.0,
                                      by=0.5, align=256, min_pad_level=0)
    h = prob.hierarchy
    print(f"# setup {time.perf_counter() - t0:.1f}s; fused gate: "
          f"{_var_kernel_ok(h.levels[0], cfg_p, jnp.float32, args.nu)}",
          flush=True)
    b = prob.rhs()
    for name, cfg in (("jnp 9-point (use_pallas=False)", cfg_j),
                      ("fused 9-plane K1v/K2v        ", cfg_p)):
        ms, cs = bench_cycles(h, cfg, b, args.cycles, args.repeats)
        print(f"{name}: {ms:8.3f} ms/V-cycle (compile {cs:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()

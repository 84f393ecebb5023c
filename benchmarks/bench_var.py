#!/usr/bin/env python
"""Config-4 (variable-coefficient diffusion) V-cycle timing on the real chip.

Tunnel-proof methodology (see bench.py): cycle loop inside jit at two
iteration counts, report the slope.  A/B of the fused K1v/K2v super-kernel
path vs the 4-launch path (var smooth+residual, standalone transfers).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    from tpu_multigrid.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
except Exception:
    pass

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid import MultigridConfig
from tpu_multigrid.problems import DiffusionProblem
from tpu_multigrid.cycles import cycle, _use_var_super_kernels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=12)
    p.add_argument("--cycles", type=int, default=8)
    p.add_argument("--nu1", type=int, default=1)
    p.add_argument("--nu2", type=int, default=1)
    p.add_argument("--smoother", default="rbgs")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--fused-only", action="store_true")
    args = p.parse_args()

    cfg = MultigridConfig(
        finest_level=args.level, coarsest_level=5, nu1=args.nu1,
        nu2=args.nu2, smoother=args.smoother, use_pallas=True)

    def coeff(x, y):
        return 1.0 + 10.0 * jnp.exp(-((x - 0.4) ** 2 + (y - 0.6) ** 2) * 20)

    t0 = time.perf_counter()
    prob = DiffusionProblem(cfg, coefficient=coeff, align=256,
                            min_pad_level=0)
    hier = prob.hierarchy
    print(f"# setup {time.perf_counter() - t0:.1f}s; fused dispatch: "
          f"{_use_var_super_kernels(hier.levels[0], hier.levels[1], cfg, jnp.float32)}")
    b = prob.rhs()
    op = hier.levels[0]
    u0 = jnp.zeros((op.S, op.S), jnp.float32)

    def bench(cfg):
        def make(k):
            @jax.jit
            def run(h, u, b):
                out = jax.lax.fori_loop(
                    0, k, lambda i, v: cycle(h, cfg, v, b), u)
                return out[1, 1] + out[2, 2]
            return run
        c1, c2 = max(args.cycles // 4, 1), args.cycles
        r1, r2 = make(c1), make(c2)
        t0 = time.perf_counter()
        float(r1(hier, u0, b)); float(r2(hier, u0, b))
        compile_s = time.perf_counter() - t0
        # median, not min: min-of-noisy-slope-differences is biased low
        slopes = []
        for _ in range(args.repeats):
            t1 = time.perf_counter(); float(r1(hier, u0, b))
            t1 = time.perf_counter() - t1
            t2 = time.perf_counter(); float(r2(hier, u0, b))
            t2 = time.perf_counter() - t2
            slopes.append((t2 - t1) / (c2 - c1))
        return sorted(slopes)[len(slopes) // 2] * 1e3, compile_s

    import dataclasses
    ms_f, cs_f = bench(cfg)
    print(f"fused K1v/K2v : {ms_f:8.3f} ms/V-cycle (compile {cs_f:.1f}s)")
    if not args.fused_only:
        # Disable the fused dispatch by switching restriction config off the
        # kernel pair? No: A/B against the previous 4-launch path by feature
        # flag below.
        cfg_unf = dataclasses.replace(cfg)
        import tpu_multigrid.cycles as C
        orig = C._use_var_super_kernels
        C._use_var_super_kernels = lambda *a, **k: False
        try:
            ms_u, cs_u = bench(cfg_unf)
        finally:
            C._use_var_super_kernels = orig
        print(f"unfused       : {ms_u:8.3f} ms/V-cycle (compile {cs_u:.1f}s)")
        print(f"speedup       : {ms_u / ms_f:.3f}x")


if __name__ == "__main__":
    main()

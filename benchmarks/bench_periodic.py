#!/usr/bin/env python
"""On-chip A/B: periodic torus V-cycle, fused wrap-aware tier vs jnp.

VERDICT r4 next #8: jnp periodic measured 11.67 ms at 4097² vs ~7 ms
interior fused — close the gap with the ghost-extended kernels + wrap
halos (cycles/periodic_fused.py) or record the waiver.  Slope timing
with scalar readback (CLAUDE.md).

Usage: python benchmarks/bench_periodic.py [level=12]
"""

import math
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
from tpu_multigrid.cycles import cycle, periodic_fused as pf
from tpu_multigrid.problems.periodic import PeriodicPoissonProblem


def _slope(r1, r2, n1, n2, reps=3):
    t0 = time.perf_counter()
    float(r1()); float(r2())
    cs = time.perf_counter() - t0
    slopes = []
    for _ in range(reps):
        t1 = time.perf_counter(); float(r1())
        t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); float(r2())
        t2 = time.perf_counter() - t2
        slopes.append((t2 - t1) / (n2 - n1))
    return sorted(slopes)[len(slopes) // 2] * 1e3, cs


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n = 2 ** level
    print(f"# device={jax.devices()[0]} level={level} ({n}^2 torus)",
          flush=True)

    cfg = MultigridConfig(finest_level=level, coarsest_level=5,
                          smoother="chebyshev", nu1=3, nu2=2,
                          use_pallas=True)
    prob = PeriodicPoissonProblem(
        cfg, forcing=lambda x, y: 8 * math.pi ** 2
        * jnp.sin(2 * math.pi * x) * jnp.cos(2 * math.pi * y))
    hier = jax.device_put(prob.hierarchy)
    b = prob.rhs()
    depth = pf.fused_levels(hier, cfg, jnp.float32)
    print(f"# fused depth: {depth} of {hier.num_levels - 1} pairs",
          flush=True)

    # jnp row (plain state, restrict_into protocol)
    u0 = jnp.zeros((n, n), jnp.float32)

    def make_jnp(k):
        @jax.jit
        def run(h, u, bb):
            out = jax.lax.fori_loop(
                0, k, lambda i, v: cycle(h, cfg, v, bb), u)
            return out[1, 1] + out[2, 2]
        return run

    r1, r2 = make_jnp(2), make_jnp(10)
    ms_j, cs = _slope(lambda: r1(hier, u0, b), lambda: r2(hier, u0, b),
                      2, 10)
    print(f"jnp   V-cycle: {ms_j:8.3f} ms (compile {cs:.1f}s)", flush=True)

    # fused row: extended state across cycles (driver semantics)
    be = pf.extend(b)
    ue0 = pf.extend(u0)

    def make_f(k):
        @jax.jit
        def run(h, ue, bbe):
            def one(i, v):
                v, _ = pf.cycle_with_norm_ext(h, cfg, v, bbe, depth)
                return v
            out = jax.lax.fori_loop(0, k, one, ue)
            return out[20, 300] + out[21, 301]
        return run

    f1, f2 = make_f(2), make_f(10)
    ms_f, cs = _slope(lambda: f1(hier, ue0, be), lambda: f2(hier, ue0, be),
                      2, 10)
    print(f"fused V-cycle: {ms_f:8.3f} ms (compile {cs:.1f}s)  "
          f"-> {ms_j/ms_f:.2f}x", flush=True)

    # convergence parity on chip
    from tpu_multigrid.cycles import solve_fixed
    res_f = jax.jit(lambda h, bb: pf.solve_fixed_periodic(h, cfg, bb, 8))(
        hier, b)
    import dataclasses
    cfgj = dataclasses.replace(cfg, use_pallas=False)
    res_j = jax.jit(lambda h, bb: solve_fixed(h, cfgj, bb, 8))(hier, b)
    hf = np.asarray(res_f.res_history)
    hj = np.asarray(res_j.res_history)
    print(f"reduction after 8 cycles: fused {hf[8]/hf[0]:.3e}  "
          f"jnp {hj[8]/hj[0]:.3e}", flush=True)


if __name__ == "__main__":
    main()

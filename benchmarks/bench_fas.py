#!/usr/bin/env python
"""FAS-tier on-chip cost A/B (VERDICT r3 next #9).

Does the nonlinear (FAS) tier merit fused Pallas kernels?  Measure a
Bratu FAS V-cycle against the linear tiers at the same size, same
smoother shape:

  a. FAS Bratu V-cycle (jnp Jacobi-Newton smoothing, dense-Newton
     coarsest)
  b. linear Poisson V-cycle, jnp tier (same transfers/smoother shape —
     isolates the phi(u)/phi'(u) overhead)
  c. linear Poisson V-cycle, fused K1/K2 tier (what a fused FAS level
     visit could plausibly reach)

plus the solve-level view: a full until-convergence Bratu solve, since
FAS work is dominated by a handful of cycles (nonlinear problems
converge in ~10 cycles — total solve time bounds what kernel investment
could save).  Slope timing with scalar readback (CLAUDE.md).

Usage: python benchmarks/bench_fas.py [--level 11] [--cycles 6]
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
from tpu_multigrid.cycles import cycle
from tpu_multigrid.cycles.fas import fas_cycle
from tpu_multigrid.problems.bratu import BratuProblem
from tpu_multigrid.problems.poisson import PoissonProblem


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


def bench_cycle_fn(hier, cfg, b, S, cyc, cycles, repeats):
    hier = jax.device_put(hier)
    u0 = jnp.zeros((S, S), cfg.dtype)

    def make(k):
        @jax.jit
        def run(h, u, bb):
            out = jax.lax.fori_loop(
                0, k, lambda i, v: cyc(h, cfg, v, bb), u)
            return out[1, 1] + out[2, 2]
        return run

    c1, c2 = max(cycles // 4, 1), cycles
    r1, r2 = make(c1), make(c2)
    return _slope(lambda: r1(hier, u0, b), lambda: r2(hier, u0, b),
                  c1, c2, repeats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=11)
    p.add_argument("--cycles", type=int, default=6)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--nu", type=int, default=2)
    p.add_argument("--lam", type=float, default=4.0)
    args = p.parse_args()

    cfg = MultigridConfig(finest_level=args.level, coarsest_level=5,
                          smoother="jacobi", nu1=args.nu, nu2=args.nu,
                          use_pallas=False)
    cfg_f = MultigridConfig(finest_level=args.level, coarsest_level=5,
                            smoother="jacobi", nu1=args.nu, nu2=args.nu,
                            use_pallas=True)
    print(f"# device={jax.devices()[0]} level={args.level} "
          f"jacobi({args.nu},{args.nu}) lam={args.lam}", flush=True)

    t0 = time.perf_counter()
    bratu = BratuProblem(cfg, lam=args.lam)
    bratu_f = BratuProblem(cfg_f, lam=args.lam, align=256, min_pad_level=0)
    pois_j = PoissonProblem(cfg)
    pois_f = PoissonProblem(cfg_f, align=256, min_pad_level=0)
    print(f"# setup {time.perf_counter() - t0:.1f}s", flush=True)

    hb = bratu.hierarchy
    Sb = hb.levels[0].S
    ms, cs = bench_cycle_fn(hb, cfg, bratu.rhs(), Sb, fas_cycle,
                            args.cycles, args.repeats)
    print(f"a. FAS Bratu V-cycle (jnp)     : {ms:8.3f} ms (compile "
          f"{cs:.1f}s)", flush=True)
    msb_fas = ms

    hbf = bratu_f.hierarchy
    ms, cs = bench_cycle_fn(hbf, cfg_f, bratu_f.rhs(), hbf.levels[0].S,
                            fas_cycle, args.cycles, args.repeats)
    print(f"a2. FAS Bratu V-cycle fused K1f/K2f: {ms:8.3f} ms (compile "
          f"{cs:.1f}s)", flush=True)

    hj = pois_j.hierarchy
    ms, cs = bench_cycle_fn(hj, cfg, pois_j.rhs(), hj.levels[0].S,
                            cycle, args.cycles, args.repeats)
    print(f"b. linear V-cycle jnp          : {ms:8.3f} ms (compile "
          f"{cs:.1f}s)", flush=True)

    hf = pois_f.hierarchy
    ms, cs = bench_cycle_fn(hf, cfg_f, pois_f.rhs(), hf.levels[0].S,
                            cycle, args.cycles, args.repeats)
    print(f"c. linear V-cycle fused K1/K2  : {ms:8.3f} ms (compile "
          f"{cs:.1f}s)", flush=True)

    # Quasilinear flux family (polynomial a(u) = 1 + 2u^2 — NO
    # transcendentals): isolates the fused tier's bandwidth win from the
    # exp-bound Bratu rows above.
    from tpu_multigrid.problems.nldiffusion import (
        QuasilinearDiffusionProblem)
    qj = QuasilinearDiffusionProblem(cfg, gamma=2.0)
    qf = QuasilinearDiffusionProblem(cfg_f, gamma=2.0, align=256,
                                     min_pad_level=0)
    ms, cs = bench_cycle_fn(qj.hierarchy, cfg, qj.rhs(),
                            qj.hierarchy.levels[0].S, fas_cycle,
                            args.cycles, args.repeats)
    print(f"q. FAS quasilinear V-cycle (jnp): {ms:8.3f} ms (compile "
          f"{cs:.1f}s)", flush=True)
    ms, cs = bench_cycle_fn(qf.hierarchy, cfg_f, qf.rhs(),
                            qf.hierarchy.levels[0].S, fas_cycle,
                            args.cycles, args.repeats)
    print(f"q2. FAS quasilinear fused qK1f/qK2f: {ms:8.3f} ms (compile "
          f"{cs:.1f}s)", flush=True)

    # Solve-level: full Bratu until-tol (bounds total FAS work)
    from tpu_multigrid import solve_bratu
    t0 = time.perf_counter()
    res = solve_bratu(args.level, lam=args.lam, config=cfg, tol=1e-6,
                      max_cycles=30)
    h = np.asarray(res.res_history)
    it = int(res.iterations)
    t1 = time.perf_counter() - t0
    print(f"solve_bratu until 1e-6: {it} cycles, |r| {h[0]:.2e} -> "
          f"{h[it]:.2e}; total {t1:.2f}s incl compile; "
          f"~{it * msb_fas / 1e3:.3f}s of cycle time", flush=True)


if __name__ == "__main__":
    main()

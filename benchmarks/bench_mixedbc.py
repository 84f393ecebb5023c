#!/usr/bin/env python
"""Mixed-BC fused-tier gap decomposition (VERDICT r3 next #4).

The r3 record compared the box-masked mixed-BC V-cycle (41.0 ms, jacobi
(2,2)) against the interior var path (7.40 ms, RB-GS(1,1)) ACROSS
sessions and smoother configs — this harness produces the clean
same-session A/B/C the anomaly diagnosis needs:

  A. interior var hierarchy (DiffusionProblem const coef, box=None)
  B. mixed hierarchy with neumann=() — box present but equal to the
     Dirichlet interior (exercises the box static-arg plumbing, no
     edge-0 wrap masks)
  C. mixed hierarchy with bottom/left Neumann — box keeps edge-0
     unknowns (low0 wrap masks + _fw_zero_wrap live)

all three timed with the SAME config (smoother, nu, levels), plus a
per-kernel decomposition of K1v/K2v at the finest level under the same
three box settings.  Slope timing with scalar readback (CLAUDE.md).
"""

import argparse
import os
import sys
import time

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
from tpu_multigrid.cycles import _use_var_super_kernels, cycle
from tpu_multigrid.kernels import varstencil as _v
from tpu_multigrid.kernels import vartransfer as _vt
from tpu_multigrid.problems import DiffusionProblem
from tpu_multigrid.problems.mixedbc import MixedBCPoissonProblem


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


def bench_k1v(op, opc, cfg, box, cbox, iters, repeats):
    coef = jax.device_put(_v._flat_coef(op))
    u0 = jnp.zeros((op.S, op.S), jnp.float32)
    b = jnp.ones((op.S, op.S), jnp.float32)

    def make(k):
        @jax.jit
        def run(u, bb, c):
            def body(i, v):
                un, _ = _vt.var_smooth_restrict_fused(
                    v, bb, c, op.n, opc.S, cfg.nu1, cfg.smoother,
                    2.0 / 3.0, box=box, cbox=cbox)
                return un
            out = jax.lax.fori_loop(0, k, body, u)
            return out[1, 1] + out[2, 2]
        return run

    k1, k2 = max(iters // 4, 1), iters
    r1, r2 = make(k1), make(k2)
    return _slope(lambda: r1(u0, b, coef), lambda: r2(u0, b, coef),
                  k1, k2, repeats)


def bench_k2v(op, cfg, box, iters, repeats):
    coef = jax.device_put(_v._flat_coef(op))
    u0 = jnp.zeros((op.S, op.S), jnp.float32)
    b = jnp.ones((op.S, op.S), jnp.float32)
    Sc = op.S // 2 + 128
    ec = jnp.zeros((Sc, Sc), jnp.float32)

    def make(k):
        @jax.jit
        def run(u, bb, e, c):
            def body(i, v):
                return _vt.var_prolong_smooth_fused(
                    v, bb, e, c, op.n, cfg.nu2, cfg.smoother,
                    2.0 / 3.0, box=box)
            out = jax.lax.fori_loop(0, k, body, u)
            return out[1, 1] + out[2, 2]
        return run

    k1, k2 = max(iters // 4, 1), iters
    r1, r2 = make(k1), make(k2)
    return _slope(lambda: r1(u0, b, ec, coef), lambda: r2(u0, b, ec, coef),
                  k1, k2, repeats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=12)
    p.add_argument("--cycles", type=int, default=8)
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--smoother", default="jacobi")
    p.add_argument("--nu1", type=int, default=2)
    p.add_argument("--nu2", type=int, default=2)
    p.add_argument("--kernels-only", action="store_true")
    args = p.parse_args()

    cfg = MultigridConfig(finest_level=args.level, coarsest_level=5,
                          nu1=args.nu1, nu2=args.nu2,
                          smoother=args.smoother, use_pallas=True)
    print(f"# device={jax.devices()[0]} level={args.level} "
          f"{args.smoother}({args.nu1},{args.nu2})", flush=True)

    t0 = time.perf_counter()
    probA = DiffusionProblem(cfg, coefficient=lambda x, y: 1.0 + 0 * x,
                             align=256, min_pad_level=0)
    probB = MixedBCPoissonProblem(cfg, neumann=(), align=256,
                                  min_pad_level=0)
    probC = MixedBCPoissonProblem(cfg, neumann=("bottom", "left"),
                                  align=256, min_pad_level=0)
    print(f"# setup {time.perf_counter() - t0:.1f}s", flush=True)
    for name, prob in (("A interior (box=None)", probA),
                       ("B box=interior     ", probB),
                       ("C box edge-0 (N bl)", probC)):
        h = prob.hierarchy
        ok = _use_var_super_kernels(h.levels[0], h.levels[1], cfg,
                                    jnp.float32)
        assert ok, name
        if not args.kernels_only:
            ms, cs = bench_cycles(h, cfg, prob.rhs(), args.cycles,
                                  args.repeats)
            print(f"{name}: {ms:8.3f} ms/V-cycle (compile {cs:.1f}s)",
                  flush=True)

    # Per-kernel decomposition at the finest level
    hA, hC = probA.hierarchy, probC.hierarchy
    n = hA.levels[0].n
    boxI = (1, n - 1, 1, n - 1)
    boxE = hC.levels[0].box
    cboxI = (1, n // 2 - 1, 1, n // 2 - 1)
    cboxE = (0, n // 2 - 1, 0, n // 2 - 1)
    for name, op, box, cbox in (
            ("K1v box=None  ", hA.levels[0], None, None),
            ("K1v box=inter ", hA.levels[0], boxI, cboxI),
            ("K1v box=edge0 ", hC.levels[0], boxE, cboxE)):
        ms, cs = bench_k1v(op, hA.levels[1], cfg, box, cbox, args.iters,
                           args.repeats)
        print(f"{name}: {ms:8.3f} ms/launch (compile {cs:.1f}s)",
              flush=True)
    for name, op, box in (("K2v box=None  ", hA.levels[0], None),
                          ("K2v box=inter ", hA.levels[0], boxI),
                          ("K2v box=edge0 ", hC.levels[0], boxE)):
        ms, cs = bench_k2v(op, cfg, box, args.iters, args.repeats)
        print(f"{name}: {ms:8.3f} ms/launch (compile {cs:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()

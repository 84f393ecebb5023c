#!/usr/bin/env python
"""A/B the 3D super-kernel VMEM window budget on the real chip.

3D analogue of bench_tc.py (VERDICT r2 #9): K1₃/K2₃ tile geometry is
derived analytically from ``WINDOW_BYTES`` (`transfer3d._tiles_k1/_tiles_k2`
balance two-axis halos under the budget), so the measurable knob is the
budget itself.  The r2 history: 10 MB default and fastest at level 8, 7 MB
slower, 14 MB VMEM-OOM on 69.5 MB of register-spill slots (BENCH.md).
This probe reproduces that sweep per level size so defaults can be set
from data, and prints the geometry each budget implies.

Fresh jit per variant: the module constant is read at trace time, and each
``loop_time`` call builds a new traced function, so in-process sweeps are
valid here (unlike the public jitted wrappers, whose jit key excludes the
budget).
"""

import argparse
import time

import jax
import jax.numpy as jnp

try:
    from tpu_multigrid.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
except Exception:
    pass

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid.core import ops3d
from tpu_multigrid.kernels import transfer3d as T3


def loop_time(step, args_, n1=3, n2=13, reps=3):
    def make(iters):
        @jax.jit
        def run(*a):
            def body(_, carry):
                return step(*((carry,) + a[1:]))
            out = jax.lax.fori_loop(0, iters, body, a[0])
            return out[1, 1, 1] + out[2, 2, 2]
        return run
    r1, r2 = make(n1), make(n2)
    float(r1(*args_)); float(r2(*args_))
    # Median of slope samples, NOT min: a min across noisy (t2 - t1)
    # differences is biased LOW (measured 0.67 ms reported for a 3.3 ms
    # kernel — bench.py's rationale).
    slopes = []
    for _ in range(reps):
        t1 = time.perf_counter(); float(r1(*args_)); t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); float(r2(*args_)); t2 = time.perf_counter() - t2
        slopes.append((t2 - t1) / (n2 - n1))
    return sorted(slopes)[len(slopes) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=8)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--mbs", type=float, nargs="+",
                   default=[7, 8, 10, 12])
    args = p.parse_args()
    n = 2 ** args.level
    S = -(-(n + 1) // 16) * 16               # align=16 (solve_poisson3d)
    Sx = -(-(n + 1) // 128) * 128            # lane_align=128
    shape = (S, S, Sx)
    Sc2 = -(-(n // 2 + 1) // 16) * 16
    Scx = -(-(n // 2 + 1) // 128) * 128
    shape_c = (Sc2, Sc2, Scx)

    key = jax.random.PRNGKey(0)
    u = ops3d.mask_interior3(
        jax.random.normal(key, shape, jnp.float32) * .01, n)
    b = ops3d.mask_interior3(
        jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32) * .01, n)
    ec = ops3d.mask_interior3(
        jax.random.normal(jax.random.PRNGKey(2), shape_c, jnp.float32) * .01,
        n // 2)

    print(f"# level={args.level} shape={shape} coarse={shape_c} "
          f"steps={args.steps} device={jax.devices()[0]}", flush=True)
    wb0 = T3.WINDOW_BYTES
    H1 = args.steps + 2
    H2 = args.steps + 1
    for mb in args.mbs:
        T3.WINDOW_BYTES = int(mb * 1024 * 1024)
        g1 = T3._tiles_k1(shape, H1, jnp.float32)
        g2 = T3._tiles_k2(shape, H2, jnp.float32)
        if g1 is None or g2 is None:
            print(f"WB={mb:5.1f}MB  unsupported (tiles {g1} / {g2})",
                  flush=True)
            continue
        try:
            t1 = loop_time(
                lambda uu, bb: T3._smooth_restrict3(
                    uu, bb, n=n, shape_c=shape_c, steps=args.steps,
                    smoother="jacobi", omega=2 / 3)[0],
                (u, b))
            # NB: without want_resnorm, _prolong_smooth3 returns the
            # updated u directly (no tuple) — do not index it.
            t2 = loop_time(
                lambda uu, bb, ee: T3._prolong_smooth3(
                    uu, bb, ee, n=n, steps=args.steps, smoother="jacobi",
                    omega=2 / 3),
                (u, b, ec))
        except Exception as e:  # VMEM OOM at large budgets — record it
            print(f"WB={mb:5.1f}MB  k1 tiles {g1}  k2 tiles {g2}  "
                  f"FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        print(f"WB={mb:5.1f}MB  k1 tiles {g1}  K1 {t1*1e3:7.3f} ms   "
              f"k2 tiles {g2}  K2 {t2*1e3:7.3f} ms", flush=True)
    T3.WINDOW_BYTES = wb0


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the transfer super-kernel column-tile width TC on the real chip.

TC=2304 gives ncols=4 at S=8448 with 768 redundant overlap columns (the
last tile clamps); TC=2816 divides 8448 exactly (3 tiles, no overlap) and
drops per-step column work 11.5%; TC=3072 is the 3-tile variant with a
smaller halo ratio but more total columns.  Fresh jit per variant (the
module constant is read at trace time).
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

from tpu_multigrid.core import ops
from tpu_multigrid.kernels import transfer as T


def loop_time(step, args_, n1=3, n2=13, reps=3):
    def make(iters):
        @jax.jit
        def run(*a):
            def body(_, carry):
                u = step(*((carry,) + a[1:]))
                return u
            out = jax.lax.fori_loop(0, iters, body, a[0])
            return out[1, 1] + out[2, 2]
        return run
    r1, r2 = make(n1), make(n2)
    float(r1(*args_)); float(r2(*args_))
    # median, not min: min-of-noisy-slope-differences is biased low
    slopes = []
    for _ in range(reps):
        t1 = time.perf_counter(); float(r1(*args_)); t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); float(r2(*args_)); t2 = time.perf_counter() - t2
        slopes.append((t2 - t1) / (n2 - n1))
    return sorted(slopes)[len(slopes) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=8448)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--tcs", type=int, nargs="+",
                   default=[2304, 2816, 3072])
    args = p.parse_args()
    S, n = args.size, args.n
    Sc = S // 2

    key = jax.random.PRNGKey(0)
    u = ops.mask_interior(jax.random.normal(key, (S, S), jnp.float32) * .01, n)
    b = ops.mask_interior(
        jax.random.normal(jax.random.PRNGKey(1), (S, S), jnp.float32) * .01, n)
    ec = ops.mask_interior(
        jax.random.normal(jax.random.PRNGKey(2), (Sc, Sc), jnp.float32) * .01,
        n // 2)

    print(f"# S={S} n={n} steps={args.steps} device={jax.devices()[0]}")
    tc0 = T.TC
    T._TC_MEASURED = {}          # probe raw widths, not the measured table
    for tc in args.tcs:
        T.TC = tc
        t1 = loop_time(
            lambda uu, bb: T._smooth_restrict(
                uu, bb, n=n, Sc=Sc, steps=args.steps, smoother="jacobi",
                omega=2 / 3)[0],
            (u, b))
        t2 = loop_time(
            lambda uu, bb, ee: T._prolong_smooth(
                uu, bb, ee, n=n, steps=args.steps, smoother="jacobi",
                omega=2 / 3)[0],
            (u, b, ec))
        print(f"TC={tc:5d}  K1 {t1*1e3:7.3f} ms   K2 {t2*1e3:7.3f} ms",
              flush=True)
    T.TC = tc0


if __name__ == "__main__":
    main()

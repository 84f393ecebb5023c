#!/usr/bin/env python
"""A/B the K1/K2 compute-core shrink on the real chip (VERDICT r2 #1a).

The sweep chain runs on a core slice of the VMEM window
(transfer._core_geom) instead of the full DMA window.  This harness times
K1/K2 (and a whole V-cycle) with the shrink ON vs OFF (OFF = monkeypatch
_core_geom to return the full DMA halos), plus the fused bf16 delta-form
variant (VERDICT r2 #7).  Fresh traces per variant: the private kernels
re-trace on every call, so in-process sweeps are valid (the public jitted
wrappers' cache keys exclude the patched function).

Timing: two-iteration-count slope with scalar readback (the only sync on
the tunneled device — CLAUDE.md).
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

from tpu_multigrid.kernels import transfer as T


def loop_time(step, args_, n1=3, n2=13, reps=5):
    def make(iters):
        @jax.jit
        def run(*a):
            def body(_, carry):
                return step(*((carry,) + a[1:]))
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
    p.add_argument("--level", type=int, default=13)
    p.add_argument("--nu1", type=int, default=3)
    p.add_argument("--nu2", type=int, default=2)
    p.add_argument("--smoother", default="jacobi")
    args = p.parse_args()
    n = 2 ** args.level
    S = -(-(n + 1) // 256) * 256
    Sc = S // 2

    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (S, S), jnp.float32) * .01
    b = jax.random.normal(jax.random.PRNGKey(1), (S, S), jnp.float32) * .01
    ec = jax.random.normal(jax.random.PRNGKey(2), (Sc, Sc), jnp.float32) * .01

    print(f"# level={args.level} S={S} nu=({args.nu1},{args.nu2}) "
          f"smoother={args.smoother} device={jax.devices()[0]}", flush=True)

    orig_core_geom = T._core_geom

    def full_geom(tr, tc, hr, hc, depth, dtype):
        q = 16 if T._is_bf16(dtype) else 8
        return hr, hc, q

    def k1(sd=None):
        return lambda uu, bb: T._smooth_restrict(
            uu, bb, n=n, Sc=Sc, steps=args.nu1, smoother=args.smoother,
            omega=2 / 3, smooth_dtype=sd)[0]

    def k2(sd=None):
        return lambda uu, bb, ee: T._prolong_smooth(
            uu, bb, ee, n=n, steps=args.nu2, smoother=args.smoother,
            omega=2 / 3, smooth_dtype=sd)[0]

    for label, geom in (("full-window (r2 baseline)", full_geom),
                        ("core-shrink", orig_core_geom)):
        T._core_geom = geom
        t1 = loop_time(k1(), (u, b))
        t2 = loop_time(k2(), (u, b, ec))
        print(f"{label:28s} K1({args.nu1}) {t1*1e3:7.3f} ms   "
              f"K2({args.nu2}) {t2*1e3:7.3f} ms", flush=True)
    T._core_geom = orig_core_geom

    # bf16 delta-form sweep chain (core-shrink geometry).
    t1 = loop_time(k1(jnp.dtype(jnp.bfloat16)), (u, b))
    t2 = loop_time(k2(jnp.dtype(jnp.bfloat16)), (u, b, ec))
    print(f"{'bf16 delta-form':28s} K1({args.nu1}) {t1*1e3:7.3f} ms   "
          f"K2({args.nu2}) {t2*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""3D op-level timings on the real chip: where does the jnp path need
Pallas?  (Tunnel-proof two-point fori_loop slope, see bench_ops.py.)"""

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

V5E_HBM_GBPS = 819.0


def loop_time(step, args_, n1=2, n2=8, reps=3):
    def make(iters):
        @jax.jit
        def run(*a):
            out = jax.lax.fori_loop(0, iters,
                                    lambda i, s: step(*((s,) + a[1:])), a[0])
            return out[1, 1, 1] + out[2, 2, 2]
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
    p.add_argument("--level", type=int, default=8)
    p.add_argument("--pad", type=int, default=1, help="round S up to this")
    args = p.parse_args()
    n = 2 ** args.level
    S = ((n + 1 + args.pad - 1) // args.pad) * args.pad
    Sc = ((n // 2 + 1 + args.pad - 1) // args.pad) * args.pad

    key = jax.random.PRNGKey(0)
    u = ops3d.mask_interior3(
        jax.random.normal(key, (S, S, S), jnp.float32) * .01, n)
    b = ops3d.mask_interior3(
        jax.random.normal(jax.random.PRNGKey(1), (S, S, S), jnp.float32) * .01, n)
    ec = ops3d.mask_interior3(
        jax.random.normal(jax.random.PRNGKey(2), (Sc, Sc, Sc), jnp.float32) * .01,
        n // 2)
    gb = S ** 3 * 4 / 1e9

    print(f"# 3D S={S} n={n} ({gb*1e3:.0f} MB/grid) device={jax.devices()[0]}")

    def report(name, step, arrs, passes):
        dt = loop_time(step, arrs)
        eff = passes * gb / dt
        print(f"{name:32s} {dt*1e3:9.3f} ms {passes:5.2f} passes "
              f"{eff:6.0f} GB/s {100*eff/V5E_HBM_GBPS:5.1f}%", flush=True)

    report("axpy floor (3-pass)", lambda s, bb: s * 0.999 + bb * 1e-6,
           (u, b), 3)
    report("jacobi 1 sweep", lambda s, bb: ops3d.jacobi_sweeps3(s, bb, n, 2/3, 1),
           (u, b), 3)
    report("jacobi 4 sweeps", lambda s, bb: ops3d.jacobi_sweeps3(s, bb, n, 2/3, 4),
           (u, b), 12)
    report("residual", lambda s, bb: ops3d.residual3(s, bb, n), (u, b), 3)
    report("rbgs 1 sweep", lambda s, bb: ops3d.redblack_gs_sweeps3(s, bb, n, 1),
           (u, b), 6)
    report("restrict_fw3", lambda s, bb: s + 0.0 * jnp.sum(
        ops3d.restrict_fw3(bb, n, Sc)), (u, b), 1.125)
    report("prolong3 (+add)", lambda s, bb, e=ec: s + ops3d.prolong3(e, n // 2, S),
           (u, b), 2.125)


if __name__ == "__main__":
    main()

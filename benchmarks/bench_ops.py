#!/usr/bin/env python
"""Op-level microbenchmarks: Pallas kernels vs the jnp/XLA fallback path.

Tunnel-proof methodology (this environment routes the TPU through a relay):
* ``block_until_ready`` does not actually synchronize — a scalar readback
  does, costing ~25-30 ms; so each op is iterated inside one jitted
  ``fori_loop`` and timed at two iteration counts, reporting the slope.
* Arrays must be jit *arguments*: closed-over device arrays are embedded as
  constants and shipped inside the remote-compile request (HTTP 413).

Reports per-op time and effective bandwidth vs the op's HBM traffic model.
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

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid.core import ops
from tpu_multigrid.kernels import stencil as K

V5E_HBM_GBPS = 819.0


def loop_time(step, u, b, n1=4, n2=24, reps=3):
    """Per-iteration time of ``step(state, b)`` via two-point differencing."""
    def make(iters):
        @jax.jit
        def run(u, b):
            out = jax.lax.fori_loop(0, iters, lambda i, s: step(s, b), u)
            return out[0, 0] + out[1, 1]   # scalar readback = the only sync
        return run

    r1, r2 = make(n1), make(n2)
    float(r1(u, b)); float(r2(u, b))       # compile both
    t1 = min(_t(r1, u, b) for _ in range(reps))
    t2 = min(_t(r2, u, b) for _ in range(reps))
    return max(t2 - t1, 1e-9) / (n2 - n1)


def _t(f, *args):
    t0 = time.perf_counter()
    float(f(*args))
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=8320)
    p.add_argument("--n", type=int, default=8192)
    args = p.parse_args()
    S, n = args.size, args.n

    key = jax.random.PRNGKey(0)
    u = ops.mask_interior(jax.random.normal(key, (S, S), jnp.float32) * .01, n)
    b = ops.mask_interior(
        jax.random.normal(jax.random.PRNGKey(1), (S, S), jnp.float32) * .01, n)
    gb = S * S * 4 / 1e9

    print(f"# S={S} n={n} device={jax.devices()[0]} "
          f"(1-pass ideal = {gb / V5E_HBM_GBPS * 1e3:.2f} ms)")
    print(f"{'op':34s} {'ms':>9s} {'passes':>7s} {'GB/s':>7s} {'%roof':>6s}")

    def report(name, step, passes):
        dt = loop_time(step, u, b)
        eff = passes * gb / dt
        print(f"{name:34s} {dt*1e3:9.3f} {passes:7.2f} {eff:7.0f} "
              f"{100*eff/V5E_HBM_GBPS:5.1f}%", flush=True)

    report("axpy floor (3-pass)", lambda s, bb: s * 0.999 + bb * 1e-6, 3)
    for k in (1, 2, 4, 8):
        report(f"pallas jacobi k={k}",
               lambda s, bb, k=k: K.jacobi_sweeps(s, bb, n, 2 / 3, k), 3)
    report("pallas jacobi k=2 + residual",
           lambda s, bb: K.jacobi_sweeps_residual(s, bb, n, 2 / 3, 2)[0], 4)
    for k in (1, 2):
        report(f"pallas rbgs k={k}",
               lambda s, bb, k=k: K.rbgs_sweeps(s, bb, n, k), 3)
    report("pallas residual", lambda s, bb: K.residual(s, bb, n), 3)
    report("xla jacobi 1 sweep",
           lambda s, bb: ops.jacobi_sweeps(s, bb, n, 2 / 3, 1), 3)
    report("xla jacobi 4 sweeps",
           lambda s, bb: ops.jacobi_sweeps(s, bb, n, 2 / 3, 4), 12)
    report("xla residual", lambda s, bb: ops.residual(s, bb, n), 3)
    Sc = (S // 2 + 127) // 128 * 128
    report("xla restrict+prolong round trip",
           lambda s, bb: ops.prolong(ops.restrict_fw(s, n, Sc), n // 2, S) + s,
           3.5)


if __name__ == "__main__":
    main()

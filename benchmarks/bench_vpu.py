#!/usr/bin/env python
"""VPU-op cost decomposition for the K1/K2 super-kernels (on-chip).

The r2 verdict: K1/K2 stream at ~260 GB/s of actual traffic vs the 670
GB/s axpy ceiling — VPU-bound.  This measures the per-element cost of each
building block (lane/sublane rolls, transposes, parity interleaves, the
full-weighting aggregate, one jacobi step) on a VMEM-resident window of the
production K1 geometry, so the optimization levers (compute-width
shrinking, decimate-early FW, transposed-space column combines) can be
ranked from data instead of guesses.

Methodology: each op is iterated inside ONE pallas kernel (no HBM traffic
per iteration) with a shape-preserving carry; timed at two iteration counts
and differenced (the standard tunnel-proof slope).  Results print as
ns/element-of-window so ops of different internal sizes are comparable.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp

try:
    from tpu_multigrid.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
except Exception:
    pass
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid.kernels.stencil import _roll, _nbr, _jacobi_step
from tpu_multigrid.kernels import transfer as T


def _iterate_kernel(op, iters):
    """pallas kernel: carry = op(carry, aux) iterated `iters` times."""
    def kernel(x_ref, aux_ref, o_ref):
        def body(i, s):
            return op(s, aux_ref[...])
        o_ref[...] = jax.lax.fori_loop(0, iters, body, x_ref[...])
    return kernel


def loop_time(op, x, aux, n1=100, n2=4100, reps=7):
    def make(iters):
        f = pl.pallas_call(
            _iterate_kernel(op, iters),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        @jax.jit
        def run(x, aux):
            y = f(x, aux)
            return y[0, 0] + y[1, 1]
        return run
    r1, r2 = make(n1), make(n2)
    float(r1(x, aux)); float(r2(x, aux))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(x, aux)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(r2(x, aux)); t2s.append(time.perf_counter() - t0)
    t1s.sort(); t2s.sort()
    med1, med2 = t1s[len(t1s) // 2], t2s[len(t2s) // 2]
    return (med2 - med1) / (n2 - n1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=288)
    p.add_argument("--cols", type=int, default=4864)
    args = p.parse_args()
    R, C = args.rows, args.cols

    x = jax.random.normal(jax.random.PRNGKey(0), (R, C), jnp.float32) * .01
    aux = jax.random.normal(jax.random.PRNGKey(1), (R, C), jnp.float32) * .01
    cells = R * C

    print(f"# window ({R}, {C}) f32, device={jax.devices()[0]}")
    print(f"{'op':38s} {'us/iter':>9s} {'ns/cell':>8s}")

    def report(name, op):
        dt = loop_time(op, x, aux)
        print(f"{name:38s} {dt*1e6:9.2f} {dt/cells*1e9:8.3f}", flush=True)

    step = _jacobi_step(2.0 / 3.0)

    def mask(shape):
        # iotas computed inside the kernel body (capture is disallowed);
        # loop-invariant, as in the production kernels
        gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        gj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        return ((gi >= 1) & (gi <= shape[0] - 2)
                & (gj >= 1) & (gj <= shape[1] - 2))

    report("mul (1 op baseline)", lambda s, a: s * 1.000001)
    report("add aux", lambda s, a: s + a)
    report("roll lane +1", lambda s, a: _roll(s, C - 1, 1) * 1.000001)
    report("roll sublane +1", lambda s, a: _roll(s, R - 1, 0) * 1.000001)
    report("nbr (4 rolls + 3 adds)", lambda s, a: _nbr(s))

    def jac(s, a):
        return step(s, a, mask(s.shape), None, 0)
    report("jacobi step (masked)", jac)

    def jac_nomask(s, a):
        return ((1.0 / 3.0) * s + (2.0 / 3.0 * 0.25) * (a + _nbr(s)))
    report("jacobi step (unmasked)", jac_nomask)

    report("where(mask) only",
           lambda s, a: jnp.where(mask(s.shape), s,
                                  jnp.zeros((), s.dtype)))
    report("transpose pair (2x)", lambda s, a: (s.T * 1.000001).T)

    def rowint(s, a):
        return T._row_interleave(s[: R // 2] * 1.000001, s[R // 2:])
    report("row de+interleave (sublane)", rowint)

    report("residual (masked)",
           lambda s, a: jnp.where(mask(s.shape),
                                  a - 4.0 * s + _nbr(s),
                                  jnp.zeros((), s.dtype)))
    report("fw_aggregate (shape-preserving)",
           lambda s, a: T._fw_aggregate(s))

    # Shape-preserving round-trips (dynamic_update_slice does not lower in
    # Mosaic): decimations are re-expanded with _interleave2, whose own cost
    # is measured separately from static quarter slices and subtracted.
    def int2_only(s, a):
        return T._interleave2(s[: R // 2, : C // 2] * 1.000001,
                              s[R // 2:, : C // 2],
                              s[: R // 2, C // 2:],
                              s[R // 2:, C // 2:])
    report("interleave2 (from quarters)", int2_only)

    def even2_rt(s, a):
        e = T._even2(s)
        return T._interleave2(e, e, e, e)
    report("even2 + interleave2 roundtrip", even2_rt)

    def fw_even2_rt(s, a):
        e = T._fw_even2(s)
        return T._interleave2(e, e, e, e)
    report("fw_even2 + interleave2 roundtrip", fw_even2_rt)

    # Full K1 tile body (2 jacobi + residual + fw_even2), re-expanded.
    def k1_body(s, a):
        m = mask(s.shape)
        st = step(s, a, m, None, 0)
        st = step(st, a, m, None, 1)
        r = jnp.where(m, a - 4.0 * st + _nbr(st), jnp.zeros((), s.dtype))
        e = T._fw_even2(r)
        return T._interleave2(e, e, e, e)
    report("K1 body (2 jac + res + fw_even2)", k1_body)

    # prolong/even2 pair on a coarse carry
    c = x[: R // 2, : C // 2]

    def prolong_even2(s, a):
        return T._even2(T._bilinear_prolong(s))
    dt = loop_time(prolong_even2, c, c)
    print(f"{'bilinear_prolong + even2 (coarse)':38s} {dt*1e6:9.2f} "
          f"{dt/cells*1e9:8.3f}", flush=True)

    # Full K2 tile body on the fine carry (prolong consumes a static
    # quarter-slice standing in for the coarse window).
    def k2_body(s, a):
        m = mask(s.shape)
        corr = T._bilinear_prolong(s[: R // 2, : C // 2])
        st = jnp.where(m, s + corr, jnp.zeros((), s.dtype))
        st = step(st, a, m, None, 0)
        st = step(st, a, m, None, 1)
        return st
    report("K2 body (prolong + add + 2 jac)", k2_body)


if __name__ == "__main__":
    main()

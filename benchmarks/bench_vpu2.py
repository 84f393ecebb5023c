#!/usr/bin/env python
"""Layout-op variants for the K1/K2 parity machinery (on-chip A/B).

bench_vpu.py showed the stack+reshape interleaves dominate the super-kernel
VPU budget (interleave2 = 26 us vs 7.3 us for a full jacobi step on the
same window).  This measures candidate replacements:

* sublane repeat (broadcast+reshape) vs stack+reshape interleave;
* parity-select assembly: out = where(row_even, rep2(a), rep2(b));
* repeat2x2 + 2 rolls bilinear prolongation (algebraically identical to
  the interleave2 form: with E = repeat2x2(c), F = 0.5*(E + roll_up(E)),
  fine = 0.5*(F + roll_left(F)));
* decimate-early full-weighting restriction (compute row3 only on even
  rows, column aggregate only on even columns in transposed space).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid.kernels.stencil import _roll
from tpu_multigrid.kernels import transfer as T


def _iterate_kernel(op, iters):
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


def _rep2_rows(a):
    """(R, C) -> (2R, C) with each row doubled: a0 a0 a1 a1 ..."""
    r, c = a.shape
    return jnp.broadcast_to(a[:, None, :], (r, 2, c)).reshape(2 * r, c)


def _interleave_rows_select(a, b):
    """(R, C), (R, C) -> (2R, C) rows a0 b0 a1 b1 via rep2 + parity select."""
    r, c = a.shape
    gi = jax.lax.broadcasted_iota(jnp.int32, (2 * r, c), 0)
    return jnp.where(gi % 2 == 0, _rep2_rows(a), _rep2_rows(b))


def _repeat2x2(c):
    """(R, C) -> (2R, 2C), each element in a 2x2 block."""
    rr = _rep2_rows(c)                   # (2R, C)
    return _rep2_rows(rr.T).T            # (2R, 2C)


def _prolong_rep(c):
    """Bilinear prolongation via repeat2x2 + two averaging rolls."""
    E = _repeat2x2(c)
    R2, C2 = E.shape
    F = 0.5 * (E + _roll(E, R2 - 1, 0))
    return 0.5 * (F + _roll(F, C2 - 1, 1))


def _fw_even2_early(r):
    """FW + even-even subsample with decimation BEFORE the aggregates.

    row3 at even rows only: row3e[i] = odd[i-1] + 2 even[i] + odd[i]
    (odd[i-1] is a +1 sublane roll of odd).  Column side identically in
    transposed space.  Arithmetic on half/quarter windows instead of full.
    """
    def dec_ax0(x):
        R, C = x.shape
        pairs = x.reshape(R // 2, 2, C)
        even = pairs[:, 0, :]
        odd = pairs[:, 1, :]
        return _roll(odd, 1, 0) + 2.0 * even + odd
    return 0.25 * dec_ax0(dec_ax0(r).T).T


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

    def report(name, op, z=None, zaux=None):
        dt = loop_time(op, z if z is not None else x,
                       zaux if zaux is not None else aux)
        print(f"{name:38s} {dt*1e6:9.2f} {dt/cells*1e9:8.3f}", flush=True)

    # correctness spot-checks: run both variants inside tiny pallas kernels
    # (pltpu.roll only lowers inside kernels)
    def in_kernel(fn, out_shape, *xs):
        def kernel(*refs):
            refs[-1][...] = fn(*[r[...] for r in refs[:-1]])
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32)
        )(*xs)

    cs = jnp.arange(16 * 256, dtype=jnp.float32).reshape(16, 256)

    def _chk(name, got, want):
        ok = bool(jnp.all(got == want))
        print(f"# check {name}: {'OK' if ok else 'MISMATCH'}")
        assert ok, name

    _chk("rep2", in_kernel(_rep2_rows, (32, 256), cs)[::2], cs)
    _chk("ilv_sel",
         in_kernel(_interleave_rows_select, (32, 256), cs, 2 * cs),
         in_kernel(T._row_interleave, (32, 256), cs, 2 * cs))
    _chk("prolong_rep", in_kernel(_prolong_rep, (32, 512), cs),
         in_kernel(T._bilinear_prolong, (32, 512), cs))
    _chk("fw_early", in_kernel(_fw_even2_early, (8, 128), cs),
         in_kernel(lambda r: T._even2(T._fw_aggregate(r)), (8, 128), cs))

    report("rep2 rows (broadcast)", lambda s, a: _rep2_rows(s[: R // 2]))
    report("row_interleave (stack, baseline)",
           lambda s, a: T._row_interleave(s[: R // 2] * 1.000001, s[R // 2:]))
    report("row_interleave (rep2+select)",
           lambda s, a: _interleave_rows_select(s[: R // 2] * 1.000001,
                                                s[R // 2:]))

    c = x[: R // 2, : C // 2]
    report("repeat2x2 (coarse->fine)",
           lambda s, a: T._even2(_repeat2x2(s)) * 1.000001, c, c)
    report("prolong interleave2 (baseline)",
           lambda s, a: T._even2(T._bilinear_prolong(s)), c, c)
    report("prolong rep2x2+rolls",
           lambda s, a: T._even2(_prolong_rep(s)), c, c)

    report("fw_even2 (baseline, + int2 rt)",
           lambda s, a: T._interleave2(*(T._fw_even2(s),) * 4))
    report("fw_even2 early-dec (+ int2 rt)",
           lambda s, a: T._interleave2(*(_fw_even2_early(s),) * 4))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness: V-cycle time / DOF-per-sec / roofline fraction.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
compares achieved DOF/s against the driver-defined north-star target:
80% of the HBM-bandwidth roofline for an unfused textbook V-cycle at
8193^2 on one v5e chip (819 GB/s HBM).  vs_baseline > 1.0 beats the target.
"""

import argparse
import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    from tpu_multigrid.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
except Exception:
    pass

V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth, GB/s
# Practical streaming ceiling measured on this chip class (axpy, r1/r2
# sessions): ~670 GB/s.  Absolute chip timings vary ~30% between sessions
# (CLAUDE.md), so every run re-measures the axpy ceiling in-session and the
# JSON carries both the fixed-constant normalization (vs_baseline) and one
# rescaled by measured-vs-nominal ceiling (vs_baseline_session_norm).
AXPY_NOMINAL_GBPS = 670.0


def measure_axpy_gbps(S=8320, reps=3):
    """Same-session streaming ceiling: 3-pass axpy at the bench's grid size.

    Uses the identical two-iteration-count slope methodology as the V-cycle
    timing (scalar readback = the only sync on the tunneled device), so the
    ratio vcycle_vs_axpy is apples-to-apples.
    """
    u = jnp.zeros((S, S), jnp.float32)
    b = jnp.ones((S, S), jnp.float32)

    def make(k):
        @jax.jit
        def run(u, b):
            out = jax.lax.fori_loop(
                0, k, lambda i, s: s * 0.999 + b * 1e-6, u)
            return out[0, 0] + out[1, 1]
        return run

    c1, c2 = 8, 40
    r1, r2 = make(c1), make(c2)
    float(r1(u, b)); float(r2(u, b))

    def t(f):
        t0 = time.perf_counter()
        float(f(u, b))
        return time.perf_counter() - t0

    slopes = sorted((t(r2) - t(r1)) / (c2 - c1) for _ in range(reps))
    best = max(slopes[len(slopes) // 2], 1e-9)
    return 3.0 * S * S * 4 / best / 1e9


def vcycle_traffic_bytes(sizes, nu1, nu2, itemsize, smoother="jacobi"):
    """Minimal HBM traffic (bytes) of one textbook *unfused* V-cycle.

    Per level: each smoother sweep reads u and b and writes u (3 passes);
    the residual reads u, b and writes r (3); restriction reads r and writes
    the coarse RHS (1 + 1/4); prolongation+correction reads e_c, reads u,
    writes u (1/4 + 2).  The coarsest-level direct solve is negligible.
    An unfused red-black GS sweep is two masked half-sweeps, i.e. 6 passes
    per sweep; jacobi/chebyshev sweeps are one pass-triple each.
    """
    per_sweep = 6.0 if smoother == "rbgs" else 3.0
    total = 0.0
    for (n, S) in sizes[:-1]:
        a = S * S * itemsize
        total += a * (per_sweep * (nu1 + nu2) + 3.0 + 1.25 + 2.25)
    return total


def run_bench(level, cycles, nu1, nu2, smoother, use_pallas, dtype, repeats,
              coarsest=None, cheb_lo=0.4):
    from tpu_multigrid import MultigridConfig, PoissonProblem, cycle
    from tpu_multigrid.core.grids import level_sizes

    if coarsest is None:
        # Deep hierarchies pay per-level fixed costs on the tiny levels;
        # truncating at 33^2 (level 5) with the exact dense coarse solve is
        # the standard choice and does not change the convergence factor.
        coarsest = 5 if level >= 8 else min(3, level - 1)
    cfg = MultigridConfig(
        finest_level=level, coarsest_level=coarsest,
        nu1=nu1, nu2=nu2, smoother=smoother, dtype=dtype,
        use_pallas=use_pallas, cheb_lo=cheb_lo)
    # 256-alignment makes every Pallas super-kernel DMA statically tiled
    # (see kernels/transfer.py); for n=2^l this is S = 2^l + 256.
    align = 256 if (use_pallas or level >= 10) else 1
    min_pad = 0 if use_pallas else 8
    prob = PoissonProblem(cfg, align=align, min_pad_level=min_pad)
    hier = prob.hierarchy
    b = prob.rhs()
    op = hier.levels[0]
    u0 = jnp.zeros((op.S, op.S), cfg.dtype)

    # Timing is tunnel-proof: on this environment's relayed TPU,
    # block_until_ready does not synchronize — only a scalar readback does
    # (~25-30 ms).  So run the cycle loop at two iteration counts inside jit
    # and report the slope, which cancels both the readback constant and any
    # per-call dispatch overhead.
    def make(k):
        @jax.jit
        def run(u, b):
            def body(_, v):
                return cycle(hier, cfg, v, b)
            out = jax.lax.fori_loop(0, k, body, u)
            return out[1, 1] + out[2, 2]
        return run

    c1, c2 = max(cycles // 4, 1), cycles
    r1, r2 = make(c1), make(c2)
    t0 = time.perf_counter()
    float(r1(u0, b)); float(r2(u0, b))
    compile_s = time.perf_counter() - t0

    def t(f):
        t0 = time.perf_counter()
        float(f(u0, b))
        return time.perf_counter() - t0

    # Median of the slope samples: a min across noisy (t2 - t1) differences
    # is biased LOW (any upward noise on a t1 sample shrinks that
    # difference), which at short spans can understate the per-cycle time
    # severely — measured here: a 1-vs-5 slope min reported 0.67 ms for a
    # kernel whose true cost (2-vs-22 slope) is 3.3 ms.
    slopes = sorted((t(r2) - t(r1)) / (c2 - c1) for _ in range(repeats))
    best = slopes[len(slopes) // 2]
    # Tiny grids can produce a negative slope (per-call noise exceeds the
    # per-cycle time); clamp to a readback-noise floor so quick-mode runs
    # stay sane.  The real (level >= 12) configs are far above this.
    best = max(best, 1e-6)

    # Convergence record (BASELINE metric "cycles to 1e-8 residual
    # reduction"), measured on-device: plain f32 hits its residual-
    # evaluation floor after ~1 cycle (CLAUDE.md).  The solve runs with
    # compensated iterative refinement (tpu_multigrid.precision): double-
    # single on small grids; on large grids the *triple-single* outer
    # iterate + double-single inner corrections (solve_refined_ts +
    # cycle_ds) — the ds representation itself floors at ~eps^2*n^2*|u|
    # relative (1.25e-8 at 8193^2, 5e-8 at 16385^2), so reaching 1e-8 at
    # scale needs the third component.  Measured at level >= 14 when the
    # bench runs at the 8193^2 north-star config (r2: 16385^2 reaches
    # 2.9e-9 relative in 9 cycles, ~40 s wall on one v5e chip).
    import dataclasses as _dc
    from tpu_multigrid import PoissonProblem as _PP
    from tpu_multigrid.precision import solve_refined_ds, solve_refined_ts

    meas_level = max(level, 14) if (level >= 13 and use_pallas) else level
    deep_ts = use_pallas and meas_level >= 10

    def refined_record(h_, cfg_, b_):
        if deep_ts:
            out = jax.jit(lambda h, b: solve_refined_ts(
                h, cfg_, b, tol=1e-8, max_iters=30, ds_levels=3))(h_, b_)
            rh, ri, ok_ = out[3], out[4], out[5]
        else:
            out = jax.jit(lambda h, b: solve_refined_ds(
                h, cfg_, b, tol=1e-8, max_iters=30))(h_, b_)
            rh, ri, ok_ = out[2], out[3], out[4]
        rh = np.asarray(rh)
        ni = int(ri)
        return rh, ni, bool(ok_), float(rh[ni] / rh[0])

    if meas_level != level:
        mcfg = _dc.replace(cfg, finest_level=meas_level,
                           coarsest_level=max(coarsest, 5))
        mprob = _PP(mcfg, align=align, min_pad_level=min_pad)
        rhist, n_it, rok, reduction_achieved = refined_record(
            mprob.hierarchy, mcfg, mprob.rhs())
    else:
        rhist, n_it, rok, reduction_achieved = refined_record(hier, cfg, b)
    rho = float((rhist[min(n_it, 8)] / rhist[0])
                ** (1.0 / max(min(n_it, 8), 1)))
    if rok:
        cycles_to_1e8 = n_it
    else:
        cycles_to_1e8 = (int(math.ceil(math.log(1e-8) / math.log(rho)))
                         if 0 < rho < 1 else None)

    # Same-session calibration: the axpy streaming ceiling on this chip
    # right now.  Separates chip-state drift from real regressions across
    # rounds (VERDICT r2 weak #7).
    # Always calibrate at full streaming size on the chip (tiny grids are
    # latency-bound and would report a meaningless ceiling); CPU test runs
    # stay small.
    on_cpu = jax.devices()[0].platform == "cpu"
    axpy_gbps = measure_axpy_gbps(S=min(op.S, 2048) if on_cpu else 8320)

    n = op.n
    dofs = (n - 1) ** 2
    dof_per_sec = dofs / best
    sizes = level_sizes(cfg, align=align, min_pad_level=min_pad)
    traffic = vcycle_traffic_bytes(sizes, nu1, nu2,
                                   jnp.dtype(cfg.dtype).itemsize, smoother)
    eff_gbps = traffic / best / 1e9
    bw_frac = eff_gbps / V5E_HBM_GBPS
    target_dof_per_sec = 0.80 * V5E_HBM_GBPS * 1e9 / (traffic / dofs)
    return {
        "level": level,
        "grid": f"{n + 1}x{n + 1}",
        "vcycle_ms": best * 1e3,
        "dof_per_sec": dof_per_sec,
        "effective_gbps": eff_gbps,
        "bandwidth_fraction": bw_frac,
        "axpy_gbps": axpy_gbps,
        "vcycle_vs_axpy": eff_gbps / axpy_gbps,
        "session_ceiling_scale": axpy_gbps / AXPY_NOMINAL_GBPS,
        "target_dof_per_sec": target_dof_per_sec,
        "compile_s": compile_s,
        "reduction_per_cycle": round(rho, 4),
        "cycles_to_1e8_reduction": cycles_to_1e8,
        "deep_reduction_achieved_f32": f"{reduction_achieved:.2e}",
        "convergence_measured_at_level": meas_level,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def tpu_alive(timeout_s=150):
    """Probe the axon TPU tunnel in a SUBPROCESS with a hard timeout.

    When the tunnel relay is dead, ``jax.devices()`` blocks forever inside
    the axon plugin's device discovery (observed r3: hung >7 min) — an
    in-process probe would hang this whole bench and the driver with it.
    A subprocess can be killed; the parent then flips to CPU before ever
    initializing a backend.
    """
    import os
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return False
    code = ("import jax, jax.numpy as jnp; "
            "assert jax.devices()[0].platform != 'cpu'; "
            "print(float(jax.jit(lambda x: (x + 1).sum())"
            "(jnp.ones((256, 256)))), 'TPU_OK')")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
        return r.returncode == 0 and "TPU_OK" in r.stdout
    except Exception:
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=13,
                   help="finest level (13 -> 8193^2, the BASELINE config)")
    p.add_argument("--coarsest", type=int, default=None,
                   help="coarsest level (default: 5 for level>=8)")
    p.add_argument("--cycles", type=int, default=10)
    p.add_argument("--repeats", type=int, default=5)
    # Chebyshev-weighted Jacobi (3,2) is the measured sweet spot: per-step
    # cost identical to plain Jacobi, reduction/cycle 0.114 vs 0.206, 9 vs
    # 12 cycles to 1e-8 at ~3% higher V-cycle time (r2 on-chip sweep).
    p.add_argument("--nu1", type=int, default=3)
    p.add_argument("--nu2", type=int, default=2)
    p.add_argument("--smoother", default="chebyshev")
    p.add_argument("--cheb-lo", type=float, default=0.4)
    p.add_argument("--pallas", action="store_true", default=None,
                   help="use fused Pallas kernels")
    p.add_argument("--no-pallas", dest="pallas", action="store_false")
    p.add_argument("--quick", action="store_true",
                   help="small grid sanity run (level 8)")
    args = p.parse_args()

    if args.quick:
        args.level = min(args.level, 8)
        args.cycles = min(args.cycles, 4)
        args.repeats = 1

    tpu_unavailable = False
    alive = tpu_alive()
    if not alive and os.environ.get("JAX_PLATFORMS", "") != "cpu":
        # One retry before forfeiting the TPU: the probe subprocess can
        # blow its timeout under transient CPU contention (a concurrent
        # test suite on this 1-core host) even when the tunnel is fine —
        # observed r4: two spurious CPU fallbacks, both contended, with
        # tpu_alive() True immediately after.  A deliberate CPU-forced
        # run (JAX_PLATFORMS=cpu) returns False without a subprocess and
        # skips the pointless sleep+retry.
        import time as _time
        _time.sleep(20)
        alive = tpu_alive(timeout_s=240)
    if not alive:
        # Dead tunnel (or CPU-forced env): flip to CPU *before* any backend
        # initialization and shrink the config — level 13 unfused on this
        # 1-core host would take tens of minutes.  The JSON still appears,
        # flagged, so the driver round artifact never hangs or vanishes.
        tpu_unavailable = True
        jax.config.update("jax_platforms", "cpu")
        args.level = min(args.level, 9)
        args.cycles = min(args.cycles, 4)
        args.repeats = min(args.repeats, 2)

    on_tpu = jax.devices()[0].platform != "cpu"
    use_pallas = args.pallas if args.pallas is not None else on_tpu

    try:
        stats = run_bench(args.level, args.cycles, args.nu1, args.nu2,
                          args.smoother, use_pallas, jnp.float32,
                          args.repeats, coarsest=args.coarsest,
                          cheb_lo=args.cheb_lo)
    except Exception:
        if use_pallas:
            # First fallback tier: fused kernels WITHOUT the compute-core
            # shrink (full DMA-halo windows, the r2-proven geometry) — so a
            # Mosaic regression in the dynamic core slicing costs ~5%, not
            # the ~100x of the pure-XLA path.
            try:
                from tpu_multigrid.kernels import transfer as _t
                _t._core_geom = lambda tr, tc, hr, hc, depth, dtype: (
                    hr, hc, 16 if _t._is_bf16(dtype) else 8)
                jax.clear_caches()
                stats = run_bench(args.level, args.cycles, args.nu1,
                                  args.nu2, args.smoother, True, jnp.float32,
                                  args.repeats, coarsest=args.coarsest,
                                  cheb_lo=args.cheb_lo)
                stats["core_shrink_fallback"] = True
            except Exception:
                # Last resort: the pure-XLA path rather than report nothing.
                stats = run_bench(args.level, args.cycles, args.nu1,
                                  args.nu2, args.smoother, False,
                                  jnp.float32, args.repeats,
                                  coarsest=args.coarsest,
                                  cheb_lo=args.cheb_lo)
                stats["pallas_fallback"] = True
        else:
            raise

    result = {
        "metric": f"poisson_vcycle_dof_per_sec_{stats['grid']}",
        "value": round(stats["dof_per_sec"], 1),
        "unit": "DOF/s",
        "vs_baseline": round(stats["dof_per_sec"] / stats["target_dof_per_sec"], 4),
        # vs_baseline with the target rescaled by the *measured* session
        # streaming ceiling (axpy) relative to the nominal 670 GB/s: on a
        # slow-session chip this reads higher than vs_baseline, on a fast
        # one lower.  Compare THIS number across rounds.
        "vs_baseline_session_norm": round(
            stats["dof_per_sec"] / stats["target_dof_per_sec"]
            / stats["session_ceiling_scale"], 4),
        "detail": {k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in stats.items()},
    }
    if tpu_unavailable:
        result["detail"]["tpu_unavailable"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()

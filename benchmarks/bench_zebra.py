#!/usr/bin/env python
"""On-chip A/B: fused Pallas zebra_x (kernels/lines.py) vs the jnp PCR
path (core.lines.zebra_sweeps), per smoother call and per V-cycle.

Slope timing with scalar readback (CLAUDE.md); hierarchy device_put once
(coefficient planes as jit args, never closures).
"""

import math
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

from tpu_multigrid import AnisotropicPoissonProblem, MultigridConfig
from tpu_multigrid.core.lines import zebra_sweeps
from tpu_multigrid.cycles import cycle
from tpu_multigrid.kernels import lines as ZL


def slope(fn, args, n1=3, n2=23, reps=5):
    def make(k):
        @jax.jit
        def run(*a):
            out = jax.lax.fori_loop(0, k, lambda i, v: fn(v, *a[1:]), a[0])
            return out.ravel()[1] + out.ravel()[2]
        return run
    r1, r2 = make(n1), make(n2)
    float(r1(*args)); float(r2(*args))
    ss = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(*args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(r2(*args)); t2 = time.perf_counter() - t0
        ss.append((t2 - t1) / (n2 - n1))
    return sorted(ss)[len(ss) // 2] * 1e3


def main():
    lvl = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    sweeps = 1
    cfg = MultigridConfig(finest_level=lvl, coarsest_level=3,
                          smoother="zebra_x", nu1=sweeps, nu2=sweeps,
                          use_pallas=False)
    prob = AnisotropicPoissonProblem(cfg, eps_x=1.0, eps_y=0.05,
                                     angle=math.radians(45),
                                     align=256, min_pad_level=0)
    hier = jax.device_put(prob.hierarchy)
    op = hier.levels[0]
    S, n = op.S, op.n
    print(f"# device={jax.devices()[0]} level={lvl} S={S} sweeps={sweeps}",
          flush=True)
    rng = np.random.default_rng(0)
    u = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1)).astype(np.float32)
    u = jax.device_put(jnp.asarray(u))
    b = jax.device_put(np.asarray(prob.rhs()))
    coef9 = op.coef.reshape(9, S, S)

    ms_jnp = slope(lambda v, bb, o: zebra_sweeps(o, v, bb, sweeps, axis=1),
                   (u, b, op))
    print(f"zebra_x jnp (1 sweep)    {ms_jnp:9.3f} ms", flush=True)
    ms_pal = slope(lambda v, bb, c: ZL.zebra_sweeps_pallas(
        v, bb, c, n, sweeps), (u, b, coef9))
    print(f"zebra_x pallas (1 sweep) {ms_pal:9.3f} ms   "
          f"({ms_jnp / ms_pal:.2f}x)", flush=True)

    # numerical check on the chip
    got = ZL.zebra_sweeps_pallas(u, b, coef9, n, sweeps)
    want = zebra_sweeps(op, u, b, sweeps, axis=1)
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"# on-chip |pallas - jnp|_max = {err:.3e}", flush=True)

    import tpu_multigrid.cycles as CY

    def vcycle_ms(use_pallas, fused_visit=True):
        """fused_visit=False: standalone zebra kernel + separate
        residual/transfer launches (the pre-K1z/K2z path)."""
        c2 = MultigridConfig(finest_level=lvl, coarsest_level=3,
                             smoother="zebra_x", nu1=sweeps, nu2=sweeps,
                             use_pallas=use_pallas)
        saved = CY._use_zebra_super_kernels
        if not fused_visit:
            CY._use_zebra_super_kernels = lambda *a: False
        try:
            return slope(lambda v, bb, h: cycle(h, c2, v, bb), (u, b, hier),
                         n1=1, n2=6)
        finally:
            CY._use_zebra_super_kernels = saved

    print(f"V-cycle jnp              {vcycle_ms(False):9.3f} ms",
          flush=True)
    ms_unf = vcycle_ms(True, fused_visit=False)
    print(f"V-cycle pallas unfused   {ms_unf:9.3f} ms", flush=True)
    ms_fus = vcycle_ms(True)
    print(f"V-cycle pallas K1z/K2z   {ms_fus:9.3f} ms   "
          f"({ms_unf / ms_fus:.2f}x over unfused visit)", flush=True)


if __name__ == "__main__":
    main()

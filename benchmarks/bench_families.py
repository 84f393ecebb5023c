#!/usr/bin/env python
"""On-chip timing of the r3 problem families (jnp tier).

The new families (semi-coarsened anisotropic, rotated tensors, upwind
convection, Mehrstellen order-4, periodic torus, 3D reaction/convection)
run the jnp tier — this records what that costs on the real chip at
mid-scale so BENCH.md can carry honest numbers (and flag any XLA:TPU
pathology the designs were supposed to avoid).  Slope timing with scalar
readback (the only sync on the tunneled device — CLAUDE.md).
"""

import math
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # The env var alone does not beat the axon plugin's config update
    # (CLAUDE.md); honor it explicitly so CPU smoke runs never touch the
    # (possibly dead) tunnel.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

try:
    from tpu_multigrid.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid import MultigridConfig
from tpu_multigrid.cycles import cycle


def time_cycles(hier, cfg, b, n1=2, n2=10, reps=3):
    # Pin the hierarchy's (possibly large) host-numpy coefficient planes
    # on device ONCE: numpy jit args re-upload per call, and over the
    # remote tunnel that transfer noise dwarfs the per-cycle slope for
    # the coefficient-heavy families (measured: negative slopes for
    # semicoarsen/zebra before this).
    hier = jax.device_put(hier)
    op = hier.levels[0]
    u0 = jnp.zeros(getattr(op, "grid_shape", (op.S, op.S)), cfg.dtype)

    def make(k):
        @jax.jit
        def run(h, u, bb):
            out = jax.lax.fori_loop(
                0, k, lambda i, v: cycle(h, cfg, v, bb), u)
            return out.ravel()[1] + out.ravel()[2]
        return run

    r1, r2 = make(n1), make(n2)
    t0 = time.perf_counter()
    float(r1(hier, u0, b)); float(r2(hier, u0, b))
    compile_s = time.perf_counter() - t0
    slopes = []
    for _ in range(reps):
        t1 = time.perf_counter(); float(r1(hier, u0, b))
        t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); float(r2(hier, u0, b))
        t2 = time.perf_counter() - t2
        slopes.append((t2 - t1) / (n2 - n1))
    ms = sorted(slopes)[len(slopes) // 2] * 1e3
    return ms, compile_s


def main():
    lvl2d = int(sys.argv[1]) if len(sys.argv) > 1 else 10   # 1025^2
    lvl3d = int(sys.argv[2]) if len(sys.argv) > 2 else 6    # 65^3
    print(f"# device={jax.devices()[0]} 2D level={lvl2d} 3D level={lvl3d}",
          flush=True)

    def report(name, prob, cfg):
        ms, cs = time_cycles(prob.hierarchy, cfg, prob.rhs())
        print(f"{name:34s} {ms:9.3f} ms/V-cycle (compile {cs:.1f}s)",
              flush=True)

    base = dict(coarsest_level=3, smoother="chebyshev", nu1=3, nu2=2,
                use_pallas=False)

    from tpu_multigrid import (AnisotropicPoissonProblem,
                               ConvectionDiffusionProblem,
                               Poisson4Problem)
    from tpu_multigrid.problems.periodic import PeriodicPoissonProblem

    cfg = MultigridConfig(finest_level=lvl2d, **base)
    report("semicoarsen aniso 100:1",
           AnisotropicPoissonProblem(cfg, eps_x=100.0, eps_y=1.0,
                                     coarsening="semi"), cfg)
    report("rotated aniso 45deg (zebra)",
           AnisotropicPoissonProblem(
               MultigridConfig(finest_level=lvl2d, coarsest_level=3,
                               smoother="zebra_x", nu1=1, nu2=1,
                               use_pallas=False),
               eps_x=1.0, eps_y=0.05, angle=math.radians(45)),
           MultigridConfig(finest_level=lvl2d, coarsest_level=3,
                           smoother="zebra_x", nu1=1, nu2=1,
                           use_pallas=False))
    zcfg = MultigridConfig(finest_level=lvl2d, coarsest_level=3,
                           smoother="zebra_x", nu1=1, nu2=1,
                           use_pallas=True)
    report("rotated aniso fused (K1z/K2z)",
           AnisotropicPoissonProblem(zcfg, eps_x=1.0, eps_y=0.05,
                                     angle=math.radians(45), align=256,
                                     min_pad_level=0), zcfg)
    ccfg = MultigridConfig(finest_level=lvl2d, coarsest_level=3,
                           smoother="rbgs", nu1=2, nu2=2,
                           use_pallas=False)
    report("upwind convection Pe~10",
           ConvectionDiffusionProblem(ccfg, eps=0.001, bx=1.0, by=0.5),
           ccfg)
    report("mehrstellen order-4", Poisson4Problem(cfg), cfg)
    mcfg = MultigridConfig(finest_level=lvl2d, coarsest_level=3,
                           smoother="chebyshev", nu1=3, nu2=2,
                           use_pallas=True)
    report("mehrstellen fused (stencil9)",
           Poisson4Problem(mcfg, align=256, min_pad_level=0), mcfg)
    report("periodic torus",
           PeriodicPoissonProblem(cfg, forcing=lambda x, y:
                                  8 * math.pi ** 2
                                  * jnp.sin(2 * math.pi * x)
                                  * jnp.cos(2 * math.pi * y)), cfg)

    from tpu_multigrid.problems.convection3d import (
        ConvectionDiffusion3DProblem)
    from tpu_multigrid.problems.diffusion3d import Diffusion3DProblem
    from tpu_multigrid.problems.poisson4_3d import Poisson4_3DProblem

    cfg3 = MultigridConfig(finest_level=lvl3d, coarsest_level=3, **{
        k: v for k, v in base.items() if k != "coarsest_level"})
    report("3d reaction-diffusion",
           Diffusion3DProblem(cfg3, coefficient=1.0, shift=5.0), cfg3)
    c3 = MultigridConfig(finest_level=lvl3d, coarsest_level=3,
                         smoother="rbgs", nu1=2, nu2=2, use_pallas=False)
    report("3d upwind convection",
           ConvectionDiffusion3DProblem(c3, eps=0.01, bx=1.0, by=0.5,
                                        bz=0.25), c3)
    report("3d mehrstellen order-4",
           Poisson4_3DProblem(cfg3, forcing=lambda x, y, z:
                              3 * math.pi ** 2 * jnp.sin(math.pi * x)
                              * jnp.sin(math.pi * y)
                              * jnp.sin(math.pi * z)), cfg3)


if __name__ == "__main__":
    main()

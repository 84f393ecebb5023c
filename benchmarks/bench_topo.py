#!/usr/bin/env python
"""Topo/unstructured (ELL) tier at production scale on chip.

VERDICT r4 next #4: the general-DOF tier had no at-scale hardware
number — ELL gathers are a known TPU pathology class, so measure it.
Rows:

  1. structured-PERMUTED topo hierarchy at 1025² (m=1.05M dofs,
     random per-level DOF renumbering — the v2 ``topo_to_space_dict``
     generality), jacobi(3,3)
  2. the structured solver on the SAME problem (jnp tier and fused
     K1/K2 tier) — what the general-DOF detour costs vs the fast path
  3. L-shape / Fichera mesh hierarchies at their largest refinements

Slope timing with scalar readback (CLAUDE.md).

Usage: python benchmarks/bench_topo.py [level=10]
"""

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

from tpu_multigrid import MultigridConfig, topo
from tpu_multigrid.cycles import cycle


def _slope(r1, r2, n1, n2, reps=3):
    t0 = time.perf_counter()
    float(r1()); float(r2())
    cs = time.perf_counter() - t0
    slopes = []
    for _ in range(reps):
        t1 = time.perf_counter(); float(r1())
        t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); float(r2())
        t2 = time.perf_counter() - t2
        slopes.append((t2 - t1) / (n2 - n1))
    return sorted(slopes)[len(slopes) // 2] * 1e3, cs


def time_topo(hier, b, nu=3, n1=2, n2=10):
    hier = jax.device_put(hier)
    b = jax.device_put(b)
    m = hier.ops[0].m
    u0 = jnp.zeros((m,), b.dtype)

    def make(k):
        @jax.jit
        def run(h, u, bb):
            out = jax.lax.fori_loop(
                0, k, lambda i, v: topo.vcycle_topo(h, v, bb, nu1=nu,
                                                    nu2=nu), u)
            return out[0] + out[1]
        return run

    r1, r2 = make(n1), make(n2)
    ms, cs = _slope(lambda: r1(hier, u0, b), lambda: r2(hier, u0, b),
                    n1, n2)
    return ms, cs, m


def time_grid(hier, cfg, b, n1=2, n2=10):
    hier = jax.device_put(hier)
    op = hier.levels[0]
    u0 = jnp.zeros(getattr(op, "grid_shape", (op.S, op.S)), cfg.dtype)

    def make(k):
        @jax.jit
        def run(h, u, bb):
            out = jax.lax.fori_loop(
                0, k, lambda i, v: cycle(h, cfg, v, bb), u)
            return out[1, 1] + out[2, 2]
        return run

    r1, r2 = make(n1), make(n2)
    return _slope(lambda: r1(hier, u0, b), lambda: r2(hier, u0, b),
                  n1, n2)


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"# device={jax.devices()[0]} structured level={level} "
          f"({2**level+1}^2)", flush=True)
    rng = np.random.default_rng(0)

    # 1. structured-permuted topo
    t0 = time.perf_counter()
    coarsest = 5
    perms = [rng.permutation((2 ** l - 1) ** 2)
             for l in range(level, coarsest - 1, -1)]
    th = topo.build_structured_topo_hierarchy_sparse(
        level, coarsest, perms=perms)
    print(f"# topo setup {time.perf_counter()-t0:.1f}s", flush=True)
    ms, cs, m = time_topo(th, th.b_levels[0])
    print(f"topo permuted {2**level+1}^2 (m={m}): {ms:9.3f} ms/V-cycle "
          f"(compile {cs:.1f}s, {m/ms*1e3/1e9:.3f} GDOF/s)", flush=True)
    # convergence sanity
    u, hist = topo.solve_topo(th, th.b_levels[0], num_cycles=8)
    h = np.asarray(hist)
    print(f"  reduction/cycle {np.mean(h[1:8]/h[:7]):.3f} "
          f"(|r| {h[0]:.2e} -> {h[8]:.2e})", flush=True)

    # 2. structured solver, same problem
    from tpu_multigrid.problems import PoissonProblem
    for name, pallas, pad in (("jnp", False, {}),
                              ("fused", True,
                               dict(align=256, min_pad_level=0))):
        cfg = MultigridConfig(finest_level=level, coarsest_level=coarsest,
                              smoother="jacobi", nu1=3, nu2=3,
                              use_pallas=pallas)
        try:
            prob = PoissonProblem(cfg, **pad)
            gms, gcs = time_grid(prob.hierarchy, cfg, prob.rhs())
        except Exception as e:
            print(f"structured {name:5s}: skipped ({type(e).__name__})",
                  flush=True)
            continue
        print(f"structured {name:5s} same problem: {gms:9.3f} ms/V-cycle "
              f"(compile {gcs:.1f}s)  topo/this = {ms/gms:.1f}x",
              flush=True)

    # 3. mesh hierarchies at largest refinements
    from tpu_multigrid.trimesh import build_mesh_hierarchy, lshape_mesh
    for lv in (7, 8):
        t0 = time.perf_counter()
        mh, meshes = build_mesh_hierarchy(lshape_mesh(), lv, f=1.0)
        setup = time.perf_counter() - t0
        ms2, cs2, m2 = time_topo(mh, mh.b_levels[0])
        print(f"L-shape levels={lv} (m={m2}, setup {setup:.1f}s): "
              f"{ms2:9.3f} ms/V-cycle (compile {cs2:.1f}s)", flush=True)

    from tpu_multigrid.tetmesh import build_tetmesh_hierarchy, fichera_mesh
    for lv in (4, 5):
        t0 = time.perf_counter()
        try:
            th3, _ = build_tetmesh_hierarchy(fichera_mesh(), lv, f=1.0)
        except Exception as e:
            print(f"fichera levels={lv}: setup failed ({e})", flush=True)
            continue
        setup = time.perf_counter() - t0
        ms3, cs3, m3 = time_topo(th3, th3.b_levels[0])
        print(f"Fichera levels={lv} (m={m3}, setup {setup:.1f}s): "
              f"{ms3:9.3f} ms/V-cycle (compile {cs3:.1f}s)", flush=True)


if __name__ == "__main__":
    main()

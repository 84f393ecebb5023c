"""On-chip driver: distributed compensated refinement, (1,1) mesh.

BASELINE config 5's convergence metric (cycles to 1e-8 at 16385^2)
through the dist refined code path (dist/refine_pallas.py) on the one
real chip.  Timing per CLAUDE.md: block_until_ready does not sync on the
tunneled device and retraces are expensive — time by the SLOPE between
two iteration counts, each measured on its second (retrace-only) call.

Usage:  python benchmarks/bench_dist_refined.py [level] [hi] [ds_levels]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    from tpu_multigrid.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
except Exception:
    pass

from tpu_multigrid import MultigridConfig
from tpu_multigrid.dist.mesh import make_grid_mesh
from tpu_multigrid.dist.refine_pallas import refined_sharded_solve_pallas


def _solve(cfg, mesh, iters, ds_levels, ts):
    res, levels = refined_sharded_solve_pallas(
        cfg, mesh, num_cycles=iters, ts=ts, ds_levels=ds_levels,
        replicate_below=256)
    h = np.asarray(res.res_history)          # readback = sync
    return h, levels


def _timed(cfg, mesh, iters, ds_levels, ts):
    t0 = time.time()
    h, levels = _solve(cfg, mesh, iters, ds_levels, ts)
    t1 = time.time()
    t2 = time.time()
    h2, _ = _solve(cfg, mesh, iters, ds_levels, ts)
    t3 = time.time()
    return h, levels, t1 - t0, t3 - t2


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    ds_levels = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    # 4th arg: ts (default 1).  The ts triple iterate carries one more
    # full-grid array; at 16385^2 extended blocks that is the difference
    # between fitting v5e HBM and ResourceExhausted - ds-only still
    # demonstrates compensated sub-f32-floor reductions.
    ts = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True
    lo = max(2, hi // 4)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    mesh = make_grid_mesh(shape=(1, 1), devices=[dev])
    # coarsest 5: the dense coarse inverse stays small (961^2 f32 ~ 3.7
    # MB) — at 7 it is 16129^2 ~ 1 GB, which must never ride the
    # remote-compile tunnel.
    cfg = MultigridConfig(finest_level=level, coarsest_level=5,
                          dtype=jnp.float32, use_pallas=True)

    h_lo, levels, c_lo, t_lo = _timed(cfg, mesh, lo, ds_levels, ts)
    print(f"levels: {levels.sizes} ({levels.num_sharded} sharded)",
          flush=True)
    print(f"lo={lo}: compile+run {c_lo:.1f}s, rerun {t_lo:.2f}s",
          flush=True)
    h_hi, _, c_hi, t_hi = _timed(cfg, mesh, hi, ds_levels, ts)
    print(f"hi={hi}: compile+run {c_hi:.1f}s, rerun {t_hi:.2f}s",
          flush=True)
    per = (t_hi - t_lo) / (hi - lo) * 1000
    rel = h_hi / h_hi[0]
    print("rel residual history:", [f"{v:.3e}" for v in rel], flush=True)
    n = 2 ** level
    dof = (n - 1) ** 2
    print(f"slope: {per:.2f} ms per refined iteration; "
          f"{dof / (per / 1000):.3e} DOF/s", flush=True)
    below = rel[np.isfinite(rel)] <= 1e-8
    k = int(np.argmax(below)) if below.any() else -1
    print(f"iterations to 1e-8: {k if k > 0 else 'not reached'}",
          flush=True)


if __name__ == "__main__":
    main()

"""Auxiliary-subsystem tests: checkpoint/resume, logging, debug guards,
profiling report (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_multigrid import MultigridConfig, PoissonProblem, solve_until_tol
from tpu_multigrid.core.operators import diffusion_op, poisson_op
from tpu_multigrid.utils import (SolveState, load_state, log_solve,
                                 profile_solve, restore_solve, save_state)
from tpu_multigrid.utils.checkpoint import state_from_result
from tpu_multigrid.utils import debug as dbg


def test_checkpoint_roundtrip_and_resume(tmp_path):
    """Interrupt a solve, checkpoint, resume; the resumed solve must reach
    the same tolerance with the remaining cycle budget."""
    cfg = MultigridConfig(finest_level=5, coarsest_level=3, dtype=jnp.float64)
    prob = PoissonProblem(cfg)
    b = prob.rhs()

    partial = solve_until_tol(prob.hierarchy, cfg, b, tol=1e-12, max_cycles=4)
    assert not bool(partial.converged)
    path = str(tmp_path / "state.npz")
    save_state(path, state_from_result(partial, cfg.finest_level))

    resumed = restore_solve(path, prob.hierarchy, cfg, b, tol=1e-12,
                            max_cycles=40)
    assert bool(resumed.converged)
    # Resume really started from the checkpoint: it needs fewer cycles than
    # a cold solve.
    cold = solve_until_tol(prob.hierarchy, cfg, b, tol=1e-12, max_cycles=40)
    assert int(resumed.iterations) < int(cold.iterations)

    # Mismatched level is rejected.
    cfg6 = MultigridConfig(finest_level=6, coarsest_level=3,
                           dtype=jnp.float64)
    prob6 = PoissonProblem(cfg6)
    with pytest.raises(ValueError):
        restore_solve(path, prob6.hierarchy, cfg6, prob6.rhs(), tol=1e-12)


def test_sharded_checkpoint_roundtrip_and_resume(tmp_path):
    """Distributed solves checkpoint/resume through the same .npz state:
    the gathered global iterate re-enters sharded_solve as u0, and the
    original initial residual stays the tolerance baseline."""
    import jax

    from tpu_multigrid.dist import make_grid_mesh
    from tpu_multigrid.dist.shard_cycle import sharded_solve
    from tpu_multigrid.utils.checkpoint import restore_sharded_solve

    cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                          dtype=jnp.float32, mesh_shape=(2, 2))
    mesh = make_grid_mesh(shape=(2, 2), devices=jax.devices()[:4])
    partial, _ = sharded_solve(cfg, mesh, tol=1e-4, max_cycles=2,
                               replicate_below=8)
    assert not bool(partial.converged)
    path = str(tmp_path / "dist_state.npz")
    save_state(path, state_from_result(partial, cfg.finest_level))

    resumed, _ = restore_sharded_solve(path, cfg, mesh, tol=1e-4,
                                       max_cycles=30, replicate_below=8)
    assert bool(resumed.converged)
    cold, _ = sharded_solve(cfg, mesh, tol=1e-4, max_cycles=30,
                            replicate_below=8)
    assert int(resumed.iterations) < int(cold.iterations)

    cfg6 = MultigridConfig(finest_level=6, coarsest_level=3,
                           dtype=jnp.float32, mesh_shape=(2, 2))
    with pytest.raises(ValueError):
        restore_sharded_solve(path, cfg6, mesh, tol=1e-4)


def test_log_solve_record(capsys):
    cfg = MultigridConfig(finest_level=4, coarsest_level=3, dtype=jnp.float64)
    prob = PoissonProblem(cfg)
    res = solve_until_tol(prob.hierarchy, cfg, prob.rhs(), tol=1e-10,
                          max_cycles=30)
    rec = log_solve(res, grid="17x17", json_lines=True)
    out = capsys.readouterr().out
    assert '"event": "solve"' in out
    assert rec["converged"] and rec["iterations"] > 0
    assert 0 < rec["reduction_per_cycle"] < 0.5


def test_profile_solve_reports():
    cfg = MultigridConfig(finest_level=5, coarsest_level=3, dtype=jnp.float32)
    prob = PoissonProblem(cfg)
    b = prob.rhs()
    from tpu_multigrid import cycle
    step = jax.jit(lambda b: cycle(prob.hierarchy, cfg, jnp.zeros_like(b), b))
    stats = profile_solve(step, b, n=32, cycles=2, traffic_bytes=1e6)
    assert stats.cycle_ms > 0 and stats.dof_per_sec > 0
    assert "GDOF/s" in str(stats)


def test_check_grid_guards():
    n, S = 8, 12
    good = np.zeros((S, S)); good[1:n, 1:n] = 1.0
    dbg.check_grid(good, n)
    bad = good.copy(); bad[0, 3] = 7.0
    with pytest.raises(AssertionError, match="invariant"):
        dbg.check_grid(bad, n)
    nan = good.copy(); nan[2, 2] = np.nan
    with pytest.raises(AssertionError, match="finite"):
        dbg.check_grid(nan, n)


def test_check_operator_passes_and_catches():
    dbg.check_operator(poisson_op(16, 17))
    cells = jnp.asarray(np.random.default_rng(0).random((16, 16)) + 0.5)
    dbg.check_operator(diffusion_op(cells, 16, 17))

    class ZeroOp:
        n, S = 16, 17
        def apply(self, u):
            return jnp.zeros_like(u)

    with pytest.raises(AssertionError, match="zero"):
        dbg.check_operator(ZeroOp())


def test_check_transfer_pair():
    dbg.check_transfer_pair(16)


def test_api_refined_mode():
    """solve_poisson(refined=True): deep f32 tolerance through the front door."""
    from tpu_multigrid import solve_poisson
    cfg = MultigridConfig(finest_level=5, coarsest_level=3,
                          dtype=jnp.float32)
    res = solve_poisson(5, config=cfg, tol=1e-9, max_cycles=40, refined=True)
    assert bool(res.converged)
    h = np.asarray(res.res_history)
    assert h[int(res.iterations)] < 1e-9 * h[0] * 1.01


def test_debug_guards_3d():
    """The sanitizers dispatch on rank: 3D grids/operators/transfers."""
    import numpy as np
    import jax.numpy as jnp
    from tpu_multigrid.core.operators import ConstStencilOp3D
    from tpu_multigrid.utils import debug

    op = ConstStencilOp3D(8, 16, 128)
    debug.check_operator(op)
    debug.check_transfer_pair(nf=8, ndim=3)
    g = np.zeros((16, 16, 128), np.float32)
    g[1:8, 1:8, 1:8] = 1.0
    debug.check_grid(g, 8)
    g[0, 0, 0] = 1.0
    try:
        debug.check_grid(g, 8)
    except AssertionError:
        pass
    else:
        raise AssertionError("boundary violation not caught")

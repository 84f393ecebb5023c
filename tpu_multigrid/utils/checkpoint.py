"""Checkpoint / resume (SURVEY.md §5).

The reference keeps all solver state in process memory and never writes
anything to disk — it doesn't even print the solution, only its size
(``Poissons_SYCL.cpp:728``).  Here the solve state is a small pytree
(iterate, cycle counter, residual history) serialized to ``.npz``; resume
feeds it back into the jitted cycle loop as the initial guess.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolveState:
    """Restartable solve state.

    ``u_lo`` carries the low-order half of a double-single iterate
    (precision.solve_refined_ds); zeros for plain solves, so resuming a
    refined solve preserves its residual trajectory instead of restarting
    the compensation from scratch.
    """
    u: Any                      # (S, S) iterate (high part for refined)
    cycles_done: Any            # int32 scalar
    res_history: Any            # f32 residual norms (NaN-padded)
    finest_level: Any           # int32 scalar (consistency check on load)
    u_lo: Any                   # (S, S) double-single low part (or zeros)


def save_state(path: str, state: SolveState) -> None:
    np.savez(
        path,
        u=np.asarray(state.u),
        cycles_done=np.asarray(state.cycles_done),
        res_history=np.asarray(state.res_history),
        finest_level=np.asarray(state.finest_level),
        u_lo=np.asarray(state.u_lo),
    )


def load_state(path: str) -> SolveState:
    with np.load(path) as z:
        u = jnp.asarray(z["u"])
        # pre-u_lo checkpoints load with a zero low part
        u_lo = jnp.asarray(z["u_lo"]) if "u_lo" in z else jnp.zeros_like(u)
        return SolveState(
            u=u,
            cycles_done=jnp.asarray(z["cycles_done"]),
            res_history=jnp.asarray(z["res_history"]),
            finest_level=jnp.asarray(z["finest_level"]),
            u_lo=u_lo,
        )


def state_from_result(result, finest_level: int, u_lo=None) -> SolveState:
    return SolveState(u=result.u, cycles_done=result.iterations,
                      res_history=result.res_history,
                      finest_level=jnp.asarray(finest_level, jnp.int32),
                      u_lo=u_lo if u_lo is not None
                      else jnp.zeros_like(result.u))


def restore_solve(path: str, hier, config, b, *, tol: float = 1e-8,
                  max_cycles: int = 100):
    """Resume an until-tol solve from a checkpoint file."""
    from ..cycles import solve_until_tol

    state = load_state(path)
    if int(state.finest_level) != config.finest_level:
        raise ValueError(
            f"checkpoint is for finest_level={int(state.finest_level)}, "
            f"config has {config.finest_level}")
    u0 = state.u.astype(b.dtype)
    if u0.shape != b.shape:
        raise ValueError(f"checkpoint grid {u0.shape} != problem {b.shape}")
    # Keep the ORIGINAL solve's initial residual as the relative-tolerance
    # baseline, so resuming doesn't rebaseline to the checkpointed iterate.
    r0 = np.asarray(state.res_history)
    r0 = float(r0[0]) if len(r0) and np.isfinite(r0[0]) else None
    return solve_until_tol(hier, config, b, tol=tol, max_cycles=max_cycles,
                           u0=u0, r0_norm=r0)


def restore_sharded_solve(path: str, config, mesh, *, tol: float = 1e-5,
                          max_cycles: int = 100, **kwargs):
    """Resume a distributed (``mesh=``) until-tol solve from a checkpoint.

    The checkpointed iterate is the gathered global grid (``save_state``
    calls ``np.asarray`` on the sharded array); it re-enters
    ``dist.shard_cycle.sharded_solve`` as ``u0`` and is re-sharded by the
    mesh placement.  The original solve's initial residual stays the
    relative-tolerance baseline (``r0_norm``), matching
    :func:`restore_solve`.  Extra ``kwargs`` (``forcing``,
    ``coefficient``, ``replicate_below``, ...) must match the original
    solve's problem.
    """
    from ..dist.shard_cycle import sharded_solve

    state = load_state(path)
    if int(state.finest_level) != config.finest_level:
        raise ValueError(
            f"checkpoint is for finest_level={int(state.finest_level)}, "
            f"config has {config.finest_level}")
    r0 = np.asarray(state.res_history)
    r0 = float(r0[0]) if len(r0) and np.isfinite(r0[0]) else None
    return sharded_solve(config, mesh, u0=np.asarray(state.u), tol=tol,
                         max_cycles=max_cycles, r0_norm=r0, **kwargs)


def restore_refined_solve(path: str, hier, config, b, *, tol: float = 1e-8,
                          max_iters: int = 60):
    """Resume a double-single refined solve from a checkpoint file.

    Seeds both halves of the double-single iterate, so the compensated
    residual picks up exactly where the checkpointed solve left off.
    """
    from ..precision import solve_refined

    state = load_state(path)
    if int(state.finest_level) != config.finest_level:
        raise ValueError(
            f"checkpoint is for finest_level={int(state.finest_level)}, "
            f"config has {config.finest_level}")
    u0 = state.u.astype(b.dtype)
    if u0.shape != b.shape:
        raise ValueError(f"checkpoint grid {u0.shape} != problem {b.shape}")
    r0 = np.asarray(state.res_history)
    r0 = float(r0[0]) if len(r0) and np.isfinite(r0[0]) else None
    return solve_refined(hier, config, b, tol=tol, max_iters=max_iters,
                         u0=u0, u0_lo=state.u_lo.astype(b.dtype), r0_norm=r0)

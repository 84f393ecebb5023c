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
    """Restartable solve state."""
    u: Any                      # (S, S) iterate
    cycles_done: Any            # int32 scalar
    res_history: Any            # f32 residual norms (NaN-padded)
    finest_level: Any           # int32 scalar (consistency check on load)


def save_state(path: str, state: SolveState) -> None:
    np.savez(
        path,
        u=np.asarray(state.u),
        cycles_done=np.asarray(state.cycles_done),
        res_history=np.asarray(state.res_history),
        finest_level=np.asarray(state.finest_level),
    )


def load_state(path: str) -> SolveState:
    with np.load(path) as z:
        return SolveState(
            u=jnp.asarray(z["u"]),
            cycles_done=jnp.asarray(z["cycles_done"]),
            res_history=jnp.asarray(z["res_history"]),
            finest_level=jnp.asarray(z["finest_level"]),
        )


def state_from_result(result, finest_level: int) -> SolveState:
    return SolveState(u=result.u, cycles_done=result.iterations,
                      res_history=result.res_history,
                      finest_level=jnp.asarray(finest_level, jnp.int32))


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

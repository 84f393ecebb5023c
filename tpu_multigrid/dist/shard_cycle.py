"""Explicit-communication distributed multigrid: shard_map + ppermute.

BASELINE config 5: large fine grids (to 16385^2) are 2D domain-decomposed
over a device mesh; fine levels run shard-local operators with ppermute
halo rings (dist.local_ops); once a level is small enough that per-shard
blocks would degenerate, the residual is all-gathered and the remaining
coarse hierarchy runs *replicated* — every device redundantly computes the
identical (tiny) coarse correction, so no further communication is needed
until the correction is prolonged back into the sharded levels.

Level sizing: sharded levels use exact halving (S_l = S_finest / 2^j) so a
local fine block maps onto exactly half-sized local coarse blocks;
replicated levels below the switch use plain (n+1) arrays and the global
``core.ops`` (which crop/pad across any size relation).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import MultigridConfig
from ..core import ops
from ..core.grids import Hierarchy, coarse_dense_inverse, round_up
from ..core.operators import poisson_op
from ..cycles import SolveResult, _coarsest_solve, cycle
from . import local_ops as L
from .mesh import GRID_AXES


@dataclasses.dataclass(frozen=True)
class ShardedLevels:
    """Static description of the sharded/replicated level split."""
    sizes: Tuple[Tuple[int, int], ...]      # (n, S) per level, finest first
    num_sharded: int                        # first k levels run shard-local

    @property
    def sharded(self):
        return self.sizes[: self.num_sharded]

    @property
    def replicated(self):
        return self.sizes[self.num_sharded:]


def sharded_level_sizes(config: MultigridConfig, mesh_shape: Tuple[int, int],
                        *, align: int = 256, replicate_below: int = 64
                        ) -> ShardedLevels:
    my, mx = mesh_shape
    m = max(my, mx, 1)
    n0 = 2 ** config.finest_level
    S0 = round_up(n0 + 1, max(align, 2 * m))
    sizes: List[Tuple[int, int]] = []
    num_sharded = 0
    S = S0
    for i, lvl in enumerate(range(config.finest_level,
                                  config.coarsest_level - 1, -1)):
        n = 2 ** lvl
        local = S // m
        halvable = S % 2 == 0 and (S // 2) % my == 0 and (S // 2) % mx == 0
        if (num_sharded == i and S % my == 0 and S % mx == 0
                and local >= replicate_below and S >= n + 1 and halvable):
            sizes.append((n, S))
            num_sharded += 1
            S //= 2
        elif num_sharded == i:
            # First replicated level: its array is the all-gather of the
            # sharded restriction, i.e. exactly half the last sharded level.
            sizes.append((n, max(S, n + 1)))
        else:
            sizes.append((n, n + 1))
    # The whole hierarchy must not be sharded: the coarsest level needs the
    # replicated direct solve.
    num_sharded = min(num_sharded, len(sizes) - 1)
    return ShardedLevels(tuple(sizes), num_sharded)


def build_sharded_poisson(config: MultigridConfig, mesh: Mesh,
                          *, replicate_below: int = 64):
    """(levels, hier) for a sharded Poisson solve on ``mesh``."""
    my, mx = mesh.devices.shape
    levels = sharded_level_sizes(config, (my, mx),
                                 replicate_below=replicate_below)
    hops = tuple(poisson_op(n, S) for (n, S) in levels.sizes)
    coarse_inv = None
    if config.coarse_solver == "direct":
        coarse_inv = coarse_dense_inverse(hops[-1])
    return levels, Hierarchy(hops, coarse_inv)


def _replicated_cycle(hier: Hierarchy, cfg: MultigridConfig, k0: int, u, b):
    """Run the replicated coarse sub-cycle (plain global ops).

    Pallas is disabled here: the replicated levels are tiny and run inside
    shard_map, where the global jnp ops are the right tool.
    """
    cfg = dataclasses.replace(cfg, use_pallas=False)
    return cycle(hier, cfg, u, b, k=k0)


def _vcycle_local(levels: ShardedLevels, hier: Hierarchy,
                  cfg: MultigridConfig, k: int, u, b):
    """V-cycle at sharded level k on local blocks (inside shard_map)."""
    n, S = levels.sizes[k]

    def smooth(u, b, n, sweeps):
        from ..cycles import _sm
        smoother, omega = _sm(cfg, sweeps)
        if smoother == "jacobi":
            return L.jacobi_local(u, b, n, omega, sweeps)
        return L.rbgs_local(u, b, n, sweeps)

    u = smooth(u, b, n, sweeps=cfg.nu1)
    r = L.residual_local(u, b, n)
    rc = L.restrict_fw_local(r, n)

    # F-cycle also recurses twice: one F pass then one V pass (the sub-config
    # replacement below turns the second pass into a V-cycle), matching
    # cycles/__init__.py:201-203.
    recurse_cnt = 2 if cfg.cycle in ("W", "F") else 1
    if k + 1 < levels.num_sharded:
        ec = jnp.zeros_like(rc)
        for i in range(recurse_cnt):
            sub = cfg if (cfg.cycle != "F" or i == 0) else \
                dataclasses.replace(cfg, cycle="V")
            ec = _vcycle_local(levels, hier, sub, k + 1, ec, rc)
    else:
        # Transition: gather the coarse RHS and run the remaining hierarchy
        # replicated on every device (identical compute, zero comm).
        rc_full = L.gather_full(rc)
        ec_full = jnp.zeros_like(rc_full)
        for i in range(recurse_cnt):
            sub = cfg if (cfg.cycle != "F" or i == 0) else \
                dataclasses.replace(cfg, cycle="V")
            if k + 1 == len(levels.sizes) - 1:
                ec_full = _coarsest_solve(hier, sub, ec_full, rc_full)
            else:
                ec_full = _replicated_cycle(hier, sub, k + 1, ec_full, rc_full)
        ec = L.local_slice(ec_full, rc.shape)

    u = u + L.prolong_local(ec, n // 2)
    u = smooth(u, b, n, sweeps=cfg.nu2)
    return u


def sharded_solve(config: MultigridConfig, mesh: Mesh, *,
                  forcing: float = 4.0, tol: float = 1e-5,
                  max_cycles: int = 100, num_cycles: Optional[int] = None,
                  replicate_below: int = 64, jit: bool = True):
    """Distributed Poisson solve with explicit halo-exchange communication.

    Returns a :class:`SolveResult` whose ``u`` is the sharded global array.
    """
    levels, hier = build_sharded_poisson(config, mesh,
                                         replicate_below=replicate_below)
    n0, S0 = levels.sizes[0]
    h2 = (1.0 / n0) ** 2
    spec = P(*GRID_AXES)

    b = jax.device_put(
        np.zeros((S0, S0), np.float32), NamedSharding(mesh, spec))

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec,),
                       out_specs=(spec, P(), P(), P()),
                       check_vma=False)
    def run(b_loc):
        # Assemble the RHS shard-locally: b = f * h^2 on the interior.
        m = L.interior_mask_local(b_loc.shape, n0)
        b_loc = jnp.where(m, jnp.asarray(forcing * h2, jnp.float32),
                          jnp.zeros((), jnp.float32))
        u = jnp.zeros_like(b_loc)
        r0 = L.norm2_local(L.residual_local(u, b_loc, n0))
        target = jnp.asarray(tol, jnp.float32) * r0
        ncyc = num_cycles if num_cycles is not None else max_cycles
        hist = jnp.full((ncyc + 1,), jnp.nan, jnp.float32).at[0].set(r0)

        def cond(carry):
            _, i, rnorm, prev, _ = carry
            keep = i < ncyc
            if num_cycles is None:
                # Stall detection only applies in until-tol mode; a fixed
                # cycle count must run to completion (matching solve_fixed)
                # so res_history has no NaN holes.
                progressing = rnorm < 0.9 * prev
                keep &= (rnorm > target) & progressing
            return keep

        def body(carry):
            u, i, rnorm, _, hist = carry
            u = _vcycle_local(levels, hier, config, 0, u, b_loc)
            rnew = L.norm2_local(L.residual_local(u, b_loc, n0))
            hist = hist.at[i + 1].set(rnew)
            return u, i + 1, rnew, rnorm, hist

        inf = jnp.asarray(jnp.inf, jnp.float32)
        u, iters, rnorm, _, hist = lax.while_loop(
            cond, body, (u, jnp.asarray(0, jnp.int32), r0, inf, hist))
        return u, hist, iters, rnorm <= target

    if jit:
        run = jax.jit(run)
    u, hist, iters, conv = run(b)
    return SolveResult(u=u, res_history=hist, iterations=iters,
                       converged=conv), levels

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
from ..core.operators import ConstStencilOp, VarStencilOp, poisson_op
from ..cycles import SolveResult, _coarsest_solve, cycle
from . import local_ops as L
from . import local_var as V
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


def build_sharded_problem(config: MultigridConfig, mesh: Mesh, *,
                          coefficient=None, operator=None,
                          operator_coarsening: str = "galerkin",
                          replicate_below: int = 64):
    """(levels, hier) for a sharded solve on ``mesh``.

    ``coefficient=None`` builds the constant Poisson hierarchy;
    a float / callable ``a(x, y)`` / (n, n) cell array builds the
    variable-coefficient flux-stencil hierarchy with host-side Galerkin
    coarsening (``galerkin_coarsen_host``) on the shard-padded level sizes —
    the distributed tier for the reference v2's operator-general design
    (``Multigrid_functions.cpp:16-26``).

    ``operator``: alternatively, a factory ``(n, S) -> VarStencilOp``
    building the operator at the shard-padded size — this distributes
    ANY of the framework's 9-point families (anisotropic/rotated tensors,
    Helmholtz shifts, nonsymmetric upwind convection: the shard-local ops
    stream the full 9 coefficient planes, so symmetry is not assumed).
    ``operator_coarsening``: ``"galerkin"`` chains host R A P from the
    finest factory call; ``"rediscretize"`` calls the factory per level
    (upwind convection, shifted diagonals — anything whose stencil
    depends on h).
    """
    my, mx = mesh.devices.shape
    levels = sharded_level_sizes(config, (my, mx),
                                 replicate_below=replicate_below)
    if coefficient is not None and operator is not None:
        raise ValueError("pass either coefficient= or operator=, not both")
    if operator is not None:
        from ..core.operators import galerkin_coarsen_host
        if operator_coarsening == "rediscretize":
            hops = tuple(operator(n, S) for (n, S) in levels.sizes)
        elif operator_coarsening == "galerkin":
            ops_list = [operator(*levels.sizes[0])]
            for (_, Sc) in levels.sizes[1:]:
                ops_list.append(galerkin_coarsen_host(ops_list[-1], Sc))
            hops = tuple(ops_list)
        else:
            raise ValueError('operator_coarsening must be "galerkin" or '
                             f'"rediscretize", got {operator_coarsening!r}')
    elif coefficient is None:
        hops = tuple(poisson_op(n, S) for (n, S) in levels.sizes)
    else:
        import jax as _jax
        from ..core.operators import diffusion_op_host, galerkin_coarsen_host
        from ..problems.diffusion import cell_coefficients

        n0, S0 = levels.sizes[0]
        if isinstance(coefficient, np.ndarray):
            cells = np.asarray(coefficient, np.dtype(config.dtype))
        else:
            try:
                cpu = _jax.devices("cpu")[0]
                with _jax.default_device(cpu):
                    cells = np.asarray(cell_coefficients(
                        n0, coefficient, config.dtype))
            except RuntimeError:
                cells = np.asarray(cell_coefficients(
                    n0, coefficient, config.dtype))
        ops_list = [diffusion_op_host(cells, n0, S0)]
        for (_, Sc) in levels.sizes[1:]:
            ops_list.append(galerkin_coarsen_host(ops_list[-1], Sc))
        hops = tuple(ops_list)
    coarse_inv = None
    if config.coarse_solver == "direct":
        coarse_inv = coarse_dense_inverse(hops[-1])
    return levels, Hierarchy(hops, coarse_inv)


def _split_hier(levels: ShardedLevels, hier: Hierarchy, mesh: Mesh):
    """Split a hierarchy for shard_map argument passing.

    Returns ``(svar, hier_repl)``: ``svar`` holds each *sharded* var level's
    (coef, inv_diag) pre-placed with (…, gy, gx) sharding (coefficient
    planes are domain-decomposed alongside u/b — they must be jit ARGUMENTS
    with shardings, never closures: closed-over arrays embed as constants in
    the remote-compile request, CLAUDE.md); ``hier_repl`` is the hierarchy
    with sharded var slots replaced by array-free placeholders, passed
    replicated for the coarse tail.
    """
    ns = levels.num_sharded
    svar = []
    repl_ops = []
    coef_spec = NamedSharding(mesh, P(None, None, *GRID_AXES))
    grid_spec = NamedSharding(mesh, P(*GRID_AXES))
    for k, op in enumerate(hier.levels):
        if k < ns and isinstance(op, VarStencilOp):
            svar.append((jax.device_put(op.coef, coef_spec),
                         jax.device_put(op.inv_diag, grid_spec)))
            repl_ops.append(ConstStencilOp(op.n, op.S))   # placeholder
        elif k < ns:
            svar.append(None)
            repl_ops.append(op)
        else:
            repl_ops.append(op)
    return tuple(svar), Hierarchy(tuple(repl_ops), hier.coarse_inv)


def _replicated_cycle(hier: Hierarchy, cfg: MultigridConfig, k0: int, u, b):
    """Run the replicated coarse sub-cycle (plain global ops).

    Pallas is disabled here: the replicated levels are tiny and run inside
    shard_map, where the global jnp ops are the right tool.
    """
    cfg = dataclasses.replace(cfg, use_pallas=False)
    return cycle(hier, cfg, u, b, k=k0)


def _local_smooth(cfg: MultigridConfig, lv, n: int, u, b, sweeps: int,
                  box=None):
    """Shard-local smoothing: Poisson 5-point (``lv=None``) or a var level's
    local (coef, inv_diag) pair.  ``box``: the level's unknown box
    (mixed-BC; var levels only)."""
    from ..cycles import _sm
    smoother, omega = _sm(cfg, sweeps)
    if lv is not None:
        coef, inv_d = lv
        if smoother == "jacobi":
            return V.var_jacobi_local(u, b, coef, inv_d, n, omega, sweeps,
                                      box=box)
        if smoother == "rbgs":
            return V.var_rbgs_local(u, b, coef, inv_d, n, sweeps, box=box)
        if smoother in ("zebra_x", "zebra_y"):
            # Line relaxation on ANY mesh: shard-local PCR when the lines
            # stay on one shard (band meshes), otherwise one tiled
            # all_to_all pair per half-sweep re-decomposes so each device
            # owns full lines (VERDICT r3 next #6).
            return V.var_zebra_alltoall(u, b, coef, n, sweeps,
                                        axis=1 if smoother == "zebra_x"
                                        else 0)
        raise ValueError(f"sharded var levels support jacobi/chebyshev/"
                         f"rbgs/zebra smoothers, not {smoother!r}")
    if smoother == "jacobi":
        return L.jacobi_local(u, b, n, omega, sweeps)
    if smoother == "rbgs":
        return L.rbgs_local(u, b, n, sweeps)
    raise ValueError(f"sharded levels support jacobi/chebyshev/rbgs "
                     f"smoothers, not {smoother!r}")


def _local_residual(lv, n: int, u, b, box=None):
    if lv is not None:
        return V.var_residual_local(u, b, lv[0], n, box=box)
    return L.residual_local(u, b, n)


def _vcycle_local(levels: ShardedLevels, hier: Hierarchy,
                  cfg: MultigridConfig, k: int, u, b, svar=(), boxes=()):
    """V-cycle at sharded level k on local blocks (inside shard_map).

    ``svar``: per-sharded-level local (coef, inv_diag) pairs or None —
    variable-coefficient levels smooth with the 9-point local operator
    (dist.local_var); transfers are operator-independent (FW / bilinear).
    ``boxes``: static per-level unknown boxes (mixed-BC) or Nones.
    """
    n, S = levels.sizes[k]
    lv = svar[k] if k < len(svar) else None
    box = boxes[k] if k < len(boxes) else None
    boxc = boxes[k + 1] if k + 1 < len(boxes) else None

    def smooth(u, b, n, sweeps):
        return _local_smooth(cfg, lv, n, u, b, sweeps, box=box)

    u = smooth(u, b, n, sweeps=cfg.nu1)
    r = _local_residual(lv, n, u, b, box=box)
    rc = L.restrict_fw_local(r, n, box=boxc)

    # F-cycle also recurses twice: one F pass then one V pass (the sub-config
    # replacement below turns the second pass into a V-cycle), matching
    # cycles/__init__.py:201-203.
    recurse_cnt = 2 if cfg.cycle in ("W", "F") else 1
    if k + 1 < levels.num_sharded:
        ec = jnp.zeros_like(rc)
        for i in range(recurse_cnt):
            sub = cfg if (cfg.cycle != "F" or i == 0) else \
                dataclasses.replace(cfg, cycle="V")
            ec = _vcycle_local(levels, hier, sub, k + 1, ec, rc, svar,
                               boxes)
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

    u = u + L.prolong_local(ec, n // 2, box=box)
    u = smooth(u, b, n, sweeps=cfg.nu2)
    return u


def _fmg_local(levels: ShardedLevels, hier: Hierarchy, cfg: MultigridConfig,
               b_loc, svar=(), boxes=()):
    """Full multigrid over the sharded/replicated level split (in shard_map).

    Restrict-RHS semantics (reference v1 FMG, ``Poissons_SYCL.cpp:629-650``):
    the fine RHS is restricted down sharded levels shard-locally, gathered at
    the replication switch, then down the replicated tail globally; the
    upward pass prolongs the coarse solution and runs ``cfg.nu0`` cycles per
    level.  Distributed FMG was VERDICT r2 missing #2.
    """
    nlev = len(levels.sizes)
    # Level 0 always runs shard-local in this driver (matching
    # _vcycle_local's recursion), even when num_sharded == 0.
    ks = max(levels.num_sharded, 1)

    def _bx(k):
        return boxes[k] if k < len(boxes) else None

    bs_local = [b_loc]
    for k in range(ks - 1):
        bs_local.append(L.restrict_fw_local(bs_local[-1],
                                            levels.sizes[k][0],
                                            box=_bx(k + 1)))
    # Transition + replicated RHS chain (full arrays, identical on every
    # device — zero communication after the gather).
    bs_full = [L.gather_full(
        L.restrict_fw_local(bs_local[-1], levels.sizes[ks - 1][0]))]
    for k in range(ks, nlev - 1):
        bs_full.append(ops.restrict_fw(bs_full[-1], levels.sizes[k][0],
                                       levels.sizes[k + 1][1]))

    # Coarsest solve, then up through the replicated tail.
    u_full = jnp.zeros_like(bs_full[-1])
    u_full = _coarsest_solve(hier, cfg, u_full, bs_full[-1])
    for k in range(nlev - 2, ks - 1, -1):
        u_full = ops.prolong(u_full, levels.sizes[k + 1][0],
                             levels.sizes[k][1])
        for _ in range(cfg.nu0):
            u_full = _replicated_cycle(hier, cfg, k, u_full, bs_full[k - ks])

    # Into the sharded tier: prolong the replicated level-ks solution onto
    # level ks-1's full grid, slice this shard's block, then local cycles.
    u_fine_full = ops.prolong(u_full, levels.sizes[ks][0],
                              levels.sizes[ks - 1][1])
    u_loc = L.local_slice(u_fine_full, bs_local[ks - 1].shape)
    for _ in range(cfg.nu0):
        u_loc = _vcycle_local(levels, hier, cfg, ks - 1, u_loc,
                              bs_local[ks - 1], svar, boxes)
    for k in range(ks - 2, -1, -1):
        u_loc = L.prolong_local(u_loc, levels.sizes[k + 1][0], box=_bx(k))
        for _ in range(cfg.nu0):
            u_loc = _vcycle_local(levels, hier, cfg, k, u_loc, bs_local[k],
                                  svar, boxes)
    return u_loc


def sharded_solve(config: MultigridConfig, mesh: Mesh, *,
                  forcing=4.0, coefficient=None, operator=None,
                  operator_coarsening: str = "galerkin", u0=None,
                  b0=None, tol: float = 1e-5, max_cycles: int = 100,
                  num_cycles: Optional[int] = None, use_fmg: bool = False,
                  replicate_below: int = 64, jit: bool = True,
                  r0_norm: Optional[float] = None):
    """Distributed solve with explicit halo-exchange communication.

    The distributed twin of :func:`api.solve_poisson` /
    :func:`api.solve_diffusion` (VERDICT r2 weak #2: one API surface,
    plus a mesh):

    * ``forcing`` — constant or callable ``f(x, y)`` (assembled
      shard-locally from global node coordinates; identical to
      ``problems.poisson.poisson_rhs``).
    * ``coefficient`` — ``None`` for Poisson, or a float / callable
      ``a(x, y)`` / (n, n) cell array for variable-coefficient diffusion
      with Galerkin-coarsened sharded levels (dist.local_var).
    * ``operator`` / ``operator_coarsening`` — a ``(n, S) ->
      VarStencilOp`` factory for any 9-point family (anisotropic /
      rotated / Helmholtz / nonsymmetric convection); see
      :func:`build_sharded_problem`.
    * ``u0`` — optional initial iterate on the global (S0, S0) padded grid.
    * ``b0`` — optional pre-assembled global RHS on the (S0, S0) padded
      grid (overrides ``forcing``); for discretizations whose RHS is not
      pointwise ``f(x, y) * h^2`` (e.g. the Mehrstellen smoothed RHS,
      ``problems.poisson4.mehrstellen_rhs``).
    * ``use_fmg`` — run one distributed full-multigrid pass first
      (:func:`_fmg_local`).
    * dtype follows ``config.dtype``.

    Returns ``(SolveResult, ShardedLevels)``; ``result.u`` is the sharded
    global array (compatible with ``utils.checkpoint`` via
    ``np.asarray``).
    """
    levels, hier = build_sharded_problem(
        config, mesh, coefficient=coefficient, operator=operator,
        operator_coarsening=operator_coarsening,
        replicate_below=replicate_below)
    n0, S0 = levels.sizes[0]
    h2 = (1.0 / n0) ** 2
    dt = jnp.dtype(config.dtype)
    spec = P(*GRID_AXES)
    gspec = NamedSharding(mesh, spec)

    boxes = tuple(getattr(op, "box", None) for op in hier.levels)
    svar, hier_repl = _split_hier(levels, hier, mesh)
    svar_specs = jax.tree.map(
        lambda a: P(None, None, *GRID_AXES) if a.ndim == 4 else spec, svar)

    u0_glob = jax.device_put(
        np.zeros((S0, S0), dt) if u0 is None else np.asarray(u0, dt), gspec)
    b_glob = jax.device_put(
        np.zeros((S0, S0), dt) if b0 is None else np.asarray(b0, dt), gspec)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, svar_specs, P()),
        out_specs=(spec, P(), P(), P()),
        check_vma=False)
    def run(b_loc, u_loc, svar_loc, hier_loc):
        # Assemble the RHS shard-locally (b = f(x, y) * h^2 on the
        # interior) unless a pre-assembled global b0 was passed in.
        if b0 is None:
            m = L.interior_mask_local(b_loc.shape, n0)
            if callable(forcing):
                r0_, c0_ = L._local_offsets(b_loc.shape)
                gi = lax.broadcasted_iota(jnp.int32, b_loc.shape, 0) + r0_
                gj = lax.broadcasted_iota(jnp.int32, b_loc.shape, 1) + c0_
                h = 1.0 / n0
                x = gj.astype(dt) * jnp.asarray(h, dt)
                y = gi.astype(dt) * jnp.asarray(h, dt)
                vals = forcing(x, y).astype(dt) * jnp.asarray(h2, dt)
            else:
                vals = jnp.full(b_loc.shape, float(forcing) * h2, dt)
            b_loc = jnp.where(m, vals, jnp.zeros((), dt))

        lv0 = svar_loc[0] if len(svar_loc) > 0 else None
        box0 = boxes[0] if boxes else None
        u = u_loc
        if use_fmg:
            u = _fmg_local(levels, hier_loc, config, b_loc, svar_loc, boxes)
        r0 = L.norm2_local(_local_residual(lv0, n0, u, b_loc, box=box0))
        # ``r0_norm`` keeps the ORIGINAL solve's initial residual as the
        # relative-tolerance baseline when resuming from a checkpoint
        # (utils.checkpoint.restore_sharded_solve), matching
        # cycles.solve_until_tol's semantics.
        rbase = (jnp.asarray(r0_norm, jnp.float32)
                 if r0_norm is not None else r0)
        target = jnp.asarray(tol, jnp.float32) * rbase
        ncyc = num_cycles if num_cycles is not None else max_cycles
        hist = jnp.full((ncyc + 1,), jnp.nan, jnp.float32).at[0].set(r0)

        def cond(carry):
            _, i, rnorm, stalls, _ = carry
            keep = i < ncyc
            if num_cycles is None:
                # Stall detection only applies in until-tol mode; a fixed
                # cycle count must run to completion (matching solve_fixed)
                # so res_history has no NaN holes.  Two CONSECUTIVE
                # non-progressing cycles are required, matching
                # cycles.solve_until_tol (one atypical first cycle must
                # not kill a converging solve).
                keep &= (rnorm > target) & (stalls < 2)
            return keep

        def body(carry):
            u, i, rnorm, stalls, hist = carry
            u = _vcycle_local(levels, hier_loc, config, 0, u, b_loc,
                              svar_loc, boxes)
            rnew = L.norm2_local(_local_residual(lv0, n0, u, b_loc,
                                                 box=box0))
            hist = hist.at[i + 1].set(rnew)
            stalls = jnp.where(rnew > 0.9 * rnorm, stalls + 1,
                               jnp.zeros_like(stalls))
            return u, i + 1, rnew, stalls, hist

        u, iters, rnorm, _, hist = lax.while_loop(
            cond, body, (u, jnp.asarray(0, jnp.int32), r0,
                         jnp.asarray(0, jnp.int32), hist))
        return u, hist, iters, rnorm <= target

    if jit:
        run = jax.jit(run)
    u, hist, iters, conv = run(b_glob, u0_glob, svar, hier_repl)
    return SolveResult(u=u, res_history=hist, iterations=iters,
                       converged=conv), levels

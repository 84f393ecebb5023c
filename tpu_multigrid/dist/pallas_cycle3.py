"""Distributed 3D multigrid with fused Pallas kernels on ghost-extended
shards.

The 3D analogue of ``dist.pallas_cycle``: (S, S, Sx) cubes decompose
(gz, gy) over a 2D mesh with the lane axis shard-local; each sharded
level keeps its block ghost-extended (``GZ3 = GY3 = 16`` cells per side
in z and y, none in x) and a level visit is one strip-wise ppermute ghost
refresh + one fused K1₃/K2₃ launch (kernels/transfer3d extended-block
variants) — the communication and bandwidth of a whole smoothing phase
amortized into a single exchange + ~3.3 HBM passes of the local block.
Coarse levels below the replicate threshold run gathered + replicated,
exactly like the 2D path.
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
from ..core.grids import Hierarchy, coarse_dense_inverse, round_up
from ..core.operators import ConstStencilOp3D
from ..cycles import SolveResult, _coarsest_solve, _sm, cycle
from ..kernels import transfer3d as KT3
from ..kernels import vartransfer3d as KV3
from . import local_ops3 as L3
from .shard_cycle3 import GRID_AXES3, make_grid_mesh3

GZ3 = 16      # ghost planes per side (even; >= steps+2)
GY3 = 16      # ghost rows per side (mult 16: coarse offsets stay aligned)
GZAX, GYAX = GRID_AXES3


# ---------------------------------------------------------------------------
# Ghost plumbing (inside shard_map)
# ---------------------------------------------------------------------------

def _ext_origin3(lz: int, ly: int):
    oz = lax.axis_index(GZAX) * lz - GZ3
    oy = lax.axis_index(GYAX) * ly - GY3
    return jnp.stack([oz, oy]).reshape(1, 2).astype(jnp.int32)


def _mask_strip3(strip, oz, oy, n):
    z, y, x = strip.shape
    gz = lax.broadcasted_iota(jnp.int32, strip.shape, 0) + oz
    gy = lax.broadcasted_iota(jnp.int32, strip.shape, 1) + oy
    gx = lax.broadcasted_iota(jnp.int32, strip.shape, 2)
    keep = ((gz >= 1) & (gz <= n - 1) & (gy >= 1) & (gy <= n - 1)
            & (gx >= 1) & (gx <= n - 1))
    return jnp.where(keep, strip, jnp.zeros((), strip.dtype))


def refresh_ghosts3(x, n: int, lz: int, ly: int,
                    dz: int = GZ3, dy: int = GY3):
    """Refill the z and y ghost shells from mesh neighbors (strips only;
    corners via two hops — z first, then y of the z-refreshed block).

    ``dz``/``dy`` (static) bound the exchange to the inner ``dz`` planes /
    ``dy`` rows of each shell — the only part that can influence valid
    kernel outputs (the 2D rationale, pallas_cycle.refresh_ghosts)."""
    Rz, Ry, Sx = x.shape
    dz, dy = min(dz, GZ3), min(dy, GY3)
    oz = lax.axis_index(GZAX) * lz - GZ3
    oy = lax.axis_index(GYAX) * ly - GY3

    top = L3._from_prev(lax.slice(x, (Rz - GZ3 - dz, 0, 0),
                                  (Rz - GZ3, Ry, Sx)), GZAX)
    bot = L3._from_next(lax.slice(x, (GZ3, 0, 0), (GZ3 + dz, Ry, Sx)), GZAX)
    x = lax.dynamic_update_slice(
        x, _mask_strip3(top, oz + GZ3 - dz, oy, n), (GZ3 - dz, 0, 0))
    x = lax.dynamic_update_slice(x, _mask_strip3(bot, oz + Rz - GZ3, oy, n),
                                 (Rz - GZ3, 0, 0))

    lf = L3._from_prev(lax.slice(x, (0, Ry - GY3 - dy, 0),
                                 (Rz, Ry - GY3, Sx)), GYAX)
    rt = L3._from_next(lax.slice(x, (0, GY3, 0), (Rz, GY3 + dy, Sx)), GYAX)
    x = lax.dynamic_update_slice(
        x, _mask_strip3(lf, oz, oy + GY3 - dy, n), (0, GY3 - dy, 0))
    x = lax.dynamic_update_slice(x, _mask_strip3(rt, oz, oy + Ry - GY3, n),
                                 (0, Ry - GY3, 0))
    return x


def _halo_depths3(cfg: MultigridConfig, halo: str):
    """(lean, dz, dy): the 3D ghost-exchange plan (see the 2D
    pallas_cycle._halo_depths for the validity-depth accounting; the z
    quantum is 2 planes, y is 8 rows)."""
    mult = 2 if cfg.smoother == "rbgs" else 1
    s1, s2 = mult * cfg.nu1, mult * cfg.nu2
    need = s1 + max(2, s2)
    lean = halo == "lean" and need <= min(GZ3, GY3)
    if not lean:
        return False, GZ3, GY3
    return True, min(GZ3, -(-need // 2) * 2), min(GY3, -(-need // 8) * 8)


def owned_view3(x):
    Rz, Ry, Sx = x.shape
    return lax.slice(x, (GZ3, GY3, 0), (Rz - GZ3, Ry - GY3, Sx))


def gather_owned3(x):
    return L3.gather_full3(owned_view3(x))


def scatter_owned3(full, lz: int, ly: int, dtype=None):
    dtype = dtype or full.dtype
    oz = lax.axis_index(GZAX) * lz
    oy = lax.axis_index(GYAX) * ly
    zero = jnp.zeros((), oz.dtype)
    blk = lax.dynamic_slice(full, (oz, oy, zero),
                            (lz, ly, full.shape[-1])).astype(dtype)
    ext = jnp.zeros((lz + 2 * GZ3, ly + 2 * GY3, full.shape[-1]), dtype)
    return lax.dynamic_update_slice(ext, blk, (GZ3, GY3, 0))


# ---------------------------------------------------------------------------
# Level sizing
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PallasLevels3:
    sizes: Tuple[Tuple[int, int, int], ...]   # (n, S, Sx) finest first
    num_sharded: int


def pallas_level_sizes3(config: MultigridConfig,
                        mesh_shape: Tuple[int, int], *,
                        replicate_below: int = 32) -> PallasLevels3:
    """(n, S, Sx) per level with the extended-block kernel constraints:
    local z extent even, local y extent mult 16, both halvable."""
    import math
    mz, my = mesh_shape
    n0 = 2 ** config.finest_level
    quantum = math.lcm(4 * mz, 32 * my, 16)
    S0 = round_up(n0 + 1, quantum)
    mult = 2 if config.smoother == "rbgs" else 1
    steps = mult * max(config.nu1, config.nu2, 1)
    sizes: List[Tuple[int, int, int]] = []
    num_sharded = 0
    S = S0
    for i, lvl in enumerate(range(config.finest_level,
                                  config.coarsest_level - 1, -1)):
        n = 2 ** lvl
        Sx = round_up(n + 1, 128)
        lz, ly = S // mz, S // my
        shape_l = (lz + 2 * GZ3, ly + 2 * GY3, Sx)
        shape_lc = (lz // 2 + 2 * GZ3, ly // 2 + 2 * GY3,
                    round_up(n // 2 + 1, 128))
        # (S/2 divisibility: the restricted owned blocks must tile the
        # global S/2 coarse array over the mesh — gather and recursion
        # both need it.  Whether level i+1 itself can stay sharded is
        # evaluated at its own iteration.)
        ok = (num_sharded == i and S % mz == 0 and S % my == 0
              and lz % 2 == 0 and ly % 16 == 0
              and min(lz, ly) >= replicate_below and S >= n + 1
              and (S // 2) % mz == 0 and (S // 2) % my == 0
              and KT3.supported_local3(shape_l, shape_lc, steps + 2,
                                       config.dtype, ghost=(GZ3, GY3)))
        if ok:
            sizes.append((n, S, Sx))
            num_sharded += 1
            S //= 2
        elif num_sharded == i:
            Sr = max(S, n + 1)
            sizes.append((n, Sr, Sx))
            S = Sr
        else:
            sizes.append((n, n + 1, round_up(n + 1, 128)))
    num_sharded = min(num_sharded, len(sizes) - 1)
    return PallasLevels3(tuple(sizes), num_sharded)


def build_pallas_poisson3(config: MultigridConfig, mesh: Mesh, *,
                          replicate_below: int = 32):
    mz, my = mesh.devices.shape
    levels = pallas_level_sizes3(config, (mz, my),
                                 replicate_below=replicate_below)
    hops = tuple(ConstStencilOp3D(n, S, Sx) for (n, S, Sx) in levels.sizes)
    coarse_inv = None
    if config.coarse_solver == "direct":
        coarse_inv = coarse_dense_inverse(hops[-1])
    return levels, Hierarchy(hops, coarse_inv)


# ---------------------------------------------------------------------------
# The fused-kernel distributed V-cycle
# ---------------------------------------------------------------------------

def _replicated_cycle3(hier, cfg, k0, u, b):
    cfg = dataclasses.replace(cfg, use_pallas=False)
    return cycle(hier, cfg, u, b, k=k0)


def _vcycle_pallas3(levels: PallasLevels3, hier: Hierarchy,
                    cfg: MultigridConfig, mesh_shape: Tuple[int, int],
                    k: int, u, b, want_norm: bool = False,
                    halo: str = "lean", u_ghosts_fresh: bool = False,
                    coefs: Tuple = ()):
    """V/W/F-cycle at sharded level k on extended blocks (in shard_map).

    ``halo="lean"`` sends depth-reduced strips and elides the pre-K2 u
    exchange (bitwise identical to "full" — tests/test_dist_pallas3.py).
    ``u_ghosts_fresh``: the caller guarantees u's ghosts are already what a
    refresh would deliver (downward-pass ec is freshly zero), eliding the
    pre-K1 exchange bitwise-identically.
    ``coefs``: per-sharded-level ghost-extended (C, ez, ey, Sx) coefficient
    blocks (var-coefficient levels run K1v₃/K2v₃; ``None`` slots run the
    constant-stencil kernels)."""
    mz, my = mesh_shape
    n, S, Sx = levels.sizes[k]
    lz, ly = S // mz, S // my
    origin = _ext_origin3(lz, ly)
    sm1, om1 = _sm(cfg, cfg.nu1)
    sm2, om2 = _sm(cfg, cfg.nu2)
    Scx = round_up(n // 2 + 1, 128)
    shape_lc = (lz // 2 + 2 * GZ3, ly // 2 + 2 * GY3, Scx)
    lean, dz, dy = _halo_depths3(cfg, halo)
    cf = coefs[k] if k < len(coefs) else None

    if not u_ghosts_fresh:
        u = refresh_ghosts3(u, n, lz, ly, dz, dy)
    if cf is not None:
        u, rc = KV3.var_smooth_restrict_ext3(u, b, cf, origin, n, shape_lc,
                                             cfg.nu1, sm1, om1,
                                             ghost=(GZ3, GY3))
    else:
        u, rc = KT3.smooth_restrict_ext3(u, b, origin, n, shape_lc, cfg.nu1,
                                         sm1, om1, ghost=(GZ3, GY3))

    recurse_cnt = 2 if cfg.cycle in ("W", "F") else 1
    if k + 1 < levels.num_sharded:
        rc = refresh_ghosts3(rc, n // 2, lz // 2, ly // 2, dz, dy)
        ec = jnp.zeros_like(rc)
        for i in range(recurse_cnt):
            sub = cfg if (cfg.cycle != "F" or i == 0) else \
                dataclasses.replace(cfg, cycle="V")
            ec = _vcycle_pallas3(levels, hier, sub, mesh_shape, k + 1,
                                 ec, rc, halo=halo, u_ghosts_fresh=(i == 0),
                                 coefs=coefs)
    else:
        rc_full = gather_owned3(rc)
        ec_full = jnp.zeros_like(rc_full)
        for i in range(recurse_cnt):
            sub = cfg if (cfg.cycle != "F" or i == 0) else \
                dataclasses.replace(cfg, cycle="V")
            if k + 1 == len(levels.sizes) - 1:
                ec_full = _coarsest_solve(hier, sub, ec_full, rc_full)
            else:
                ec_full = _replicated_cycle3(hier, sub, k + 1, ec_full,
                                             rc_full)
        ec = scatter_owned3(ec_full, lz // 2, ly // 2, dtype=u.dtype)

    # K2₃ reads only the inner (GZ3/2, GY3/2) coarse ghost rings
    # (transfer3d._prolong_smooth_local3's window starts at ghost/2).
    ec = refresh_ghosts3(ec, n // 2, lz // 2, ly // 2,
                         GZ3 // 2 if lean else GZ3,
                         GY3 // 2 if lean else GY3)
    if not lean:
        u = refresh_ghosts3(u, n, lz, ly)
    if cf is not None:
        if want_norm:
            u, ss = KV3.var_prolong_smooth_ext3(u, b, ec, cf, origin, n,
                                                cfg.nu2, sm2, om2,
                                                ghost=(GZ3, GY3),
                                                want_resnorm=True)
            ss = lax.psum(lax.psum(ss, GZAX), GYAX)
            return u, jnp.sqrt(ss).astype(jnp.float32)
        return KV3.var_prolong_smooth_ext3(u, b, ec, cf, origin, n,
                                           cfg.nu2, sm2, om2,
                                           ghost=(GZ3, GY3))
    if want_norm:
        u, ss = KT3.prolong_smooth_ext3(u, b, ec, origin, n, cfg.nu2,
                                        sm2, om2, ghost=(GZ3, GY3),
                                        want_resnorm=True)
        ss = lax.psum(lax.psum(ss, GZAX), GYAX)
        return u, jnp.sqrt(ss).astype(jnp.float32)
    return KT3.prolong_smooth_ext3(u, b, ec, origin, n, cfg.nu2, sm2, om2,
                                   ghost=(GZ3, GY3))


def sharded_solve_pallas3(config: MultigridConfig, mesh: Mesh, *,
                          forcing: float = 6.0, tol: float = 1e-5,
                          max_cycles: int = 100,
                          num_cycles: Optional[int] = None,
                          replicate_below: int = 32, jit: bool = True,
                          halo: str = "lean"):
    """Distributed 3D Poisson solve on the fused Pallas local-kernel path.

    ``halo``: "lean" (default) exchanges depth-reduced ghost strips and
    elides the pre-K2 u exchange; "full" refreshes every shell before
    every launch.  Bitwise identical (tests/test_dist_pallas3.py)."""
    mz, my = mesh.devices.shape
    levels, hier = build_pallas_poisson3(config, mesh,
                                         replicate_below=replicate_below)
    if levels.num_sharded < 1:
        raise ValueError(
            f"no level satisfies the 3D Pallas shard constraints for mesh "
            f"{(mz, my)} at finest_level={config.finest_level} "
            f"(levels: {levels.sizes})")
    n0, S0, Sx0 = levels.sizes[0]
    lz, ly = S0 // mz, S0 // my
    h2 = (1.0 / n0) ** 2
    spec = P(*GRID_AXES3, None)

    b_glob = jax.device_put(np.zeros((S0, S0, Sx0), np.float32),
                            NamedSharding(mesh, spec))

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec,),
                       out_specs=(spec, P(), P(), P()),
                       check_vma=False)
    def run(b_loc):
        ext_shape = (lz + 2 * GZ3, ly + 2 * GY3, Sx0)
        oz = lax.axis_index(GZAX) * lz - GZ3
        oy = lax.axis_index(GYAX) * ly - GY3
        gz = lax.broadcasted_iota(jnp.int32, ext_shape, 0) + oz
        gy = lax.broadcasted_iota(jnp.int32, ext_shape, 1) + oy
        gx = lax.broadcasted_iota(jnp.int32, ext_shape, 2)
        inter = ((gz >= 1) & (gz <= n0 - 1) & (gy >= 1) & (gy <= n0 - 1)
                 & (gx >= 1) & (gx <= n0 - 1))
        owned = ((gz >= lax.axis_index(GZAX) * lz)
                 & (gz < (lax.axis_index(GZAX) + 1) * lz)
                 & (gy >= lax.axis_index(GYAX) * ly)
                 & (gy < (lax.axis_index(GYAX) + 1) * ly))
        b_ext = jnp.where(inter & owned,
                          jnp.asarray(forcing * h2, jnp.float32),
                          jnp.zeros((), jnp.float32))
        b_ext = refresh_ghosts3(b_ext, n0, lz, ly)

        u = jnp.zeros_like(b_ext)
        r0 = L3.norm2_local3(owned_view3(b_ext))
        target = jnp.asarray(tol, jnp.float32) * r0
        ncyc = num_cycles if num_cycles is not None else max_cycles
        hist = jnp.full((ncyc + 1,), jnp.nan, jnp.float32).at[0].set(r0)

        def cond(carry):
            _, i, rnorm, prev, _ = carry
            keep = i < ncyc
            if num_cycles is None:
                progressing = rnorm < 0.9 * prev
                keep &= (rnorm > target) & progressing
            return keep

        def body(carry):
            u, i, rnorm, _, hist = carry
            u, rnew = _vcycle_pallas3(levels, hier, config, (mz, my), 0,
                                      u, b_ext, want_norm=True, halo=halo)
            hist = hist.at[i + 1].set(rnew)
            return u, i + 1, rnew, rnorm, hist

        inf = jnp.asarray(jnp.inf, jnp.float32)
        u, iters, rnorm, _, hist = lax.while_loop(
            cond, body, (u, jnp.asarray(0, jnp.int32), r0, inf, hist))
        return owned_view3(u), hist, iters, rnorm <= target

    if jit:
        run = jax.jit(run)
    u, hist, iters, conv = run(b_glob)
    return SolveResult(u=u, res_history=hist, iterations=iters,
                       converged=conv), levels


# ---------------------------------------------------------------------------
# Variable-coefficient tier: K1v₃/K2v₃ on ghost-extended shards
# ---------------------------------------------------------------------------

def pallas_var_level_sizes3(config: MultigridConfig,
                            mesh_shape: Tuple[int, int], *,
                            nplanes: int = 3,
                            replicate_below: int = 32) -> PallasLevels3:
    """``pallas_level_sizes3`` under the var-kernel support gate (smaller
    VMEM windows: the coefficient slab shares the budget)."""
    import math
    mz, my = mesh_shape
    n0 = 2 ** config.finest_level
    quantum = math.lcm(4 * mz, 32 * my, 16)
    S0 = round_up(n0 + 1, quantum)
    mult = 2 if config.smoother == "rbgs" else 1
    steps = mult * max(config.nu1, config.nu2, 1)
    sizes: List[Tuple[int, int, int]] = []
    num_sharded = 0
    S = S0
    for i, lvl in enumerate(range(config.finest_level,
                                  config.coarsest_level - 1, -1)):
        n = 2 ** lvl
        Sx = round_up(n + 1, 128)
        lz, ly = S // mz, S // my
        shape_l = (lz + 2 * GZ3, ly + 2 * GY3, Sx)
        shape_lc = (lz // 2 + 2 * GZ3, ly // 2 + 2 * GY3,
                    round_up(n // 2 + 1, 128))
        ok = (num_sharded == i and S % mz == 0 and S % my == 0
              and lz % 2 == 0 and ly % 16 == 0
              and min(lz, ly) >= replicate_below and S >= n + 1
              and (S // 2) % mz == 0 and (S // 2) % my == 0
              and KV3.supported_local_var3(shape_l, shape_lc, steps + 2,
                                           config.dtype, ghost=(GZ3, GY3),
                                           nplanes=nplanes))
        if ok:
            sizes.append((n, S, Sx))
            num_sharded += 1
            S //= 2
        elif num_sharded == i:
            Sr = max(S, n + 1)
            sizes.append((n, Sr, Sx))
            S = Sr
        else:
            sizes.append((n, n + 1, round_up(n + 1, 128)))
    num_sharded = min(num_sharded, len(sizes) - 1)
    return PallasLevels3(tuple(sizes), num_sharded)


def build_pallas_diffusion3(config: MultigridConfig, mesh: Mesh,
                            coefficient, *, shift=0.0,
                            replicate_below: int = 32):
    """Variable-coefficient (7-point flux) hierarchy at the fused-kernel
    distributed level sizes.

    Mirrors ``problems.diffusion3d.build_diffusion3d_hierarchy`` (2x2x2
    cell-averaged coarse re-discretization, optional reaction ``shift``)
    at ``pallas_var_level_sizes3``'s mesh-aligned (n, S, Sx) sizes.  All
    host numpy until device placement.
    """
    from ..problems.diffusion3d import (_with_shift3, cell_coefficients3,
                                        coarsen_cells3)
    from ..core.operators import diffusion_op3_host

    mz, my = mesh.devices.shape
    with_shift = callable(shift) or float(shift) != 0.0
    levels = pallas_var_level_sizes3(
        config, (mz, my), nplanes=4 if with_shift else 3,
        replicate_below=replicate_below)
    np_dt = np.dtype(jnp.dtype(config.dtype).name)
    cells = cell_coefficients3(2 ** config.finest_level, coefficient)
    hops = []
    for (n, S, Sx) in levels.sizes:
        op = diffusion_op3_host(cells.astype(np_dt), n, S, Sx)
        if with_shift:
            op = _with_shift3(op, shift, np_dt)
        hops.append(op)
        if n > 2 ** config.coarsest_level:
            cells = coarsen_cells3(cells)
    coarse_inv = None
    if config.coarse_solver == "direct":
        coarse_inv = coarse_dense_inverse(hops[-1])
    return levels, Hierarchy(tuple(hops), coarse_inv)


def _ext_coef_layout3(op, mz: int, my: int) -> np.ndarray:
    """Host (C, mz*ez, my*ey, Sx) extended-block coefficient layout.

    Block (iz, iy) holds its ghost-INCLUSIVE slice of the global planes
    (true neighbor values in the ghost shells — coefficients are static,
    so the exchange happens once here instead of per cycle; domain-edge
    ghosts read the zero padding, which the kernels' masks ignore).
    Sharded with P(None, gz, gy, None), each device's shard is exactly
    its extended block.
    """
    from ..kernels.vartransfer3d import _flat_coef3
    st = getattr(op, "coef_stack", None)
    if st is None:
        st = np.asarray(_flat_coef3(op))
    st = np.asarray(st)
    C, S, _, Sx = st.shape
    lz, ly = S // mz, S // my
    ez, ey = lz + 2 * GZ3, ly + 2 * GY3
    cpad = np.pad(st, ((0, 0), (GZ3, GZ3), (GY3, GY3), (0, 0)))
    glob = np.zeros((C, mz * ez, my * ey, Sx), st.dtype)
    for iz in range(mz):
        zrows = cpad[:, iz * lz: iz * lz + ez]
        for iy in range(my):
            glob[:, iz * ez: (iz + 1) * ez, iy * ey: (iy + 1) * ey] = \
                zrows[:, :, iy * ly: iy * ly + ey]
    return glob


def _split_pallas_var3(levels: PallasLevels3, hier: Hierarchy, mesh: Mesh):
    """(coefs, hier_repl): per-sharded-level extended coefficient blocks
    placed with the extended-block sharding, and the hierarchy with the
    sharded levels' arrays replaced by array-free placeholders (the
    replicated tail keeps its true var operators and coarse inverse —
    passed into shard_map as a replicated argument, never a closure).

    Accepts flux-symmetric ``VarStencilOp3D`` (3/4-plane stacks) and
    nonsymmetric ``Directional7Op`` (6-plane directional stacks) — the
    kernels dispatch on the stack depth (vartransfer3d._expand_t3)."""
    from ..core.operators import VarStencilOp3D
    from ..problems.convection3d import Directional7Op

    mz, my = mesh.devices.shape
    spec = NamedSharding(mesh, jax.sharding.PartitionSpec(
        None, GZAX, GYAX, None))
    coefs = []
    repl_ops = []
    for k, op in enumerate(hier.levels):
        if k < levels.num_sharded and isinstance(
                op, (VarStencilOp3D, Directional7Op)):
            coefs.append(jax.device_put(_ext_coef_layout3(op, mz, my),
                                        spec))
            repl_ops.append(ConstStencilOp3D(op.n, op.S, op.Sx))
        else:
            if k < levels.num_sharded:
                coefs.append(None)
            repl_ops.append(op)
    return tuple(coefs), Hierarchy(tuple(repl_ops), hier.coarse_inv)


def sharded_solve_pallas_var3(config: MultigridConfig, mesh: Mesh, *,
                              coefficient, forcing: float = 6.0,
                              shift=0.0, tol: float = 1e-5,
                              max_cycles: int = 100,
                              num_cycles: Optional[int] = None,
                              replicate_below: int = 32,
                              jit: bool = True, halo: str = "lean"):
    """Distributed 3D variable-coefficient diffusion on the fused
    K1v₃/K2v₃ local-kernel path.

    The reference's v2 operator-general intent
    (``Multigrid_functions.cpp:16-26``) at multi-chip scale with the
    fused-kernel bandwidth profile: per-level flux planes live sharded in
    the extended-block layout (ghosts pre-filled at setup — coefficients
    are static, so they are never exchanged again), u/b ride the same
    ghost machinery as the Poisson path.
    """
    levels, hier = build_pallas_diffusion3(
        config, mesh, coefficient, shift=shift,
        replicate_below=replicate_below)
    return _sharded_solve_var3_from(config, mesh, levels, hier,
                                    forcing=forcing, tol=tol,
                                    max_cycles=max_cycles,
                                    num_cycles=num_cycles, jit=jit,
                                    halo=halo)


def build_pallas_convection3(config: MultigridConfig, mesh: Mesh, *,
                             eps, bx, by, bz, replicate_below: int = 32):
    """Variable-wind upwind hierarchy (``Directional7Op`` per level) at
    the fused-kernel distributed level sizes — the distributed twin of
    ``problems.convection3d.build_convection3d_hierarchy`` with
    ``pallas_var_level_sizes3``'s mesh-aligned (n, S, Sx) and 6-plane
    window budgets."""
    from ..problems.convection3d import convection_diffusion_op3

    mz, my = mesh.devices.shape
    levels = pallas_var_level_sizes3(config, (mz, my), nplanes=6,
                                     replicate_below=replicate_below)
    np_dt = np.dtype(jnp.dtype(config.dtype).name)
    hops = [convection_diffusion_op3(n, S, Sx, eps, bx, by, bz,
                                     dtype=np_dt)
            for (n, S, Sx) in levels.sizes]
    coarse_inv = None
    if config.coarse_solver == "direct":
        coarse_inv = coarse_dense_inverse(hops[-1])
    return levels, Hierarchy(tuple(hops), coarse_inv)


def sharded_solve_pallas_conv3(config: MultigridConfig, mesh: Mesh, *,
                               eps, bx, by, bz, forcing: float = 6.0,
                               tol: float = 1e-5, max_cycles: int = 100,
                               num_cycles: Optional[int] = None,
                               replicate_below: int = 32,
                               jit: bool = True, halo: str = "lean"):
    """Distributed 3D VARIABLE-WIND upwind convection-diffusion on the
    fused directional K1v₃/K2v₃ path (6-plane streaming; VERDICT r4
    next #1's dist story).  Same contract as
    :func:`sharded_solve_pallas_var3`."""
    levels, hier = build_pallas_convection3(
        config, mesh, eps=eps, bx=bx, by=by, bz=bz,
        replicate_below=replicate_below)
    return _sharded_solve_var3_from(config, mesh, levels, hier,
                                    forcing=forcing, tol=tol,
                                    max_cycles=max_cycles,
                                    num_cycles=num_cycles, jit=jit,
                                    halo=halo)


def _sharded_solve_var3_from(config: MultigridConfig, mesh: Mesh, levels,
                             hier, *, forcing, tol, max_cycles,
                             num_cycles, jit, halo):
    mz, my = mesh.devices.shape
    if levels.num_sharded < 1:
        raise ValueError(
            f"no level satisfies the 3D var Pallas shard constraints for "
            f"mesh {(mz, my)} at finest_level={config.finest_level} "
            f"(levels: {levels.sizes})")
    n0, S0, Sx0 = levels.sizes[0]
    lz, ly = S0 // mz, S0 // my
    h2 = (1.0 / n0) ** 2
    spec = P(*GRID_AXES3, None)

    coefs, hier_repl = _split_pallas_var3(levels, hier, mesh)
    coef_specs = jax.tree.map(
        lambda _: P(None, *GRID_AXES3, None), coefs)

    b_glob = jax.device_put(np.zeros((S0, S0, Sx0), np.float32),
                            NamedSharding(mesh, spec))

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, coef_specs, P()),
                       out_specs=(spec, P(), P(), P()),
                       check_vma=False)
    def run(b_loc, coefs_loc, hier_loc):
        ext_shape = (lz + 2 * GZ3, ly + 2 * GY3, Sx0)
        oz = lax.axis_index(GZAX) * lz - GZ3
        oy = lax.axis_index(GYAX) * ly - GY3
        gz = lax.broadcasted_iota(jnp.int32, ext_shape, 0) + oz
        gy = lax.broadcasted_iota(jnp.int32, ext_shape, 1) + oy
        gx = lax.broadcasted_iota(jnp.int32, ext_shape, 2)
        inter = ((gz >= 1) & (gz <= n0 - 1) & (gy >= 1) & (gy <= n0 - 1)
                 & (gx >= 1) & (gx <= n0 - 1))
        owned = ((gz >= lax.axis_index(GZAX) * lz)
                 & (gz < (lax.axis_index(GZAX) + 1) * lz)
                 & (gy >= lax.axis_index(GYAX) * ly)
                 & (gy < (lax.axis_index(GYAX) + 1) * ly))
        b_ext = jnp.where(inter & owned,
                          jnp.asarray(forcing * h2, jnp.float32),
                          jnp.zeros((), jnp.float32))
        b_ext = refresh_ghosts3(b_ext, n0, lz, ly)

        u = jnp.zeros_like(b_ext)
        r0 = L3.norm2_local3(owned_view3(b_ext))
        target = jnp.asarray(tol, jnp.float32) * r0
        ncyc = num_cycles if num_cycles is not None else max_cycles
        hist = jnp.full((ncyc + 1,), jnp.nan, jnp.float32).at[0].set(r0)

        def cond(carry):
            _, i, rnorm, prev, _ = carry
            keep = i < ncyc
            if num_cycles is None:
                progressing = rnorm < 0.9 * prev
                keep &= (rnorm > target) & progressing
            return keep

        def body(carry):
            u, i, rnorm, _, hist = carry
            u, rnew = _vcycle_pallas3(levels, hier_loc, config, (mz, my),
                                      0, u, b_ext, want_norm=True,
                                      halo=halo, coefs=coefs_loc)
            hist = hist.at[i + 1].set(rnew)
            return u, i + 1, rnew, rnorm, hist

        inf = jnp.asarray(jnp.inf, jnp.float32)
        u, iters, rnorm, _, hist = lax.while_loop(
            cond, body, (u, jnp.asarray(0, jnp.int32), r0, inf, hist))
        return owned_view3(u), hist, iters, rnorm <= target

    if jit:
        run = jax.jit(run)
    u, hist, iters, conv = run(b_glob, coefs, hier_repl)
    return SolveResult(u=u, res_history=hist, iterations=iters,
                       converged=conv), levels

"""Distributed general-DOF (topo) multigrid: GSPMD row partitioning.

The topo tier (``tpu_multigrid.topo``) is the TPU-native form of the
reference's v2 arbitrary-DOF design (``Multigrid_functions.cpp:16-26``):
1D space vectors, ELL gather operators, gather-table transfers.  Its
natural distribution is **1D row partitioning**: every (m, ...) leaf is
sharded on axis 0 over all mesh devices, each device owns a contiguous
block of DOF rows, and the gathers (``u[cols]``, ``ec[src0]``) read the
full vector — XLA/GSPMD inserts the all-gather.  This is the textbook
row-parallel SpMV layout for unstructured problems: per-apply traffic is
one all-gather of the iterate (the structured families avoid it with
halo exchanges, which is why they remain the fast path — the topo tier
trades that for full DOF-numbering generality, exactly as on one chip).

DOF counts ((n-1)^2, mesh node counts) never divide the device count, so
the hierarchy is **padded**: each level's space dimension m grows to the
next multiple of the device count with at least one pad slot, under the
same invariant the structured grids use — *every pad slot of every space
vector is zero at all times*:

- padded ELL rows have all-zero coefficients and zero ``d_inv``, so
  Jacobi and residuals keep pads at zero;
- the single-chip classes' out-of-band "ext zero slot" index ``m``
  becomes an ordinary in-band pad slot (still zero by the invariant), so
  the padded ops drop the per-apply ``concatenate`` entirely;
- the coarsest dense inverse is zero-embedded, so the direct solve
  preserves pads;
- the variational restriction masks its pad segments (eliminated
  parents alias pad slot ``m_c``, which must not retain their weights).

Row-block arithmetic is unchanged by padding (appended rows only), so a
distributed solve reproduces the single-chip trajectory to roundoff.

Entry: :func:`gspmd_solve_topo`, or ``solve_topo(..., mesh=...)``.
Covers every TopoHierarchy producer — ``build_structured_topo_hierarchy``
(arbitrary DOF permutations), ``trimesh.build_mesh_hierarchy`` (2D
unstructured), ``tetmesh.build_tetmesh_hierarchy`` (3D unstructured).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..topo import EllOp, TopoHierarchy, TopoTransfer

__all__ = ["DistEllOp", "DistTopoTransfer", "pad_topo_hierarchy",
           "gspmd_solve_topo"]


def _round_up(m: int, k: int) -> int:
    return ((m + k - 1) // k) * k


@jax.tree_util.register_pytree_node_class
class DistEllOp:
    """Padded ELL operator: same surface as :class:`topo.EllOp`, no
    per-apply ext-slot concatenate (pad slots are in-band zeros)."""

    def __init__(self, cols, vals, d_inv):
        self.cols = cols
        self.vals = vals
        self.d_inv = d_inv

    def tree_flatten(self):
        return (self.cols, self.vals, self.d_inv), ()

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)

    @property
    def m(self) -> int:
        return self.cols.shape[0]

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(self.vals.astype(u.dtype) * u[self.cols], axis=1)

    def residual(self, u: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return b - self.apply(u)

    def jacobi(self, u, b, omega: Union[float, Tuple[float, ...]],
               sweeps: int) -> jnp.ndarray:
        dinv = self.d_inv.astype(u.dtype)
        ws = omega if isinstance(omega, tuple) else (omega,) * sweeps
        for s in range(sweeps):
            w = jnp.asarray(ws[s % len(ws)], u.dtype)
            u = u + w * dinv * self.residual(u, b)
        return u

    def __repr__(self):
        return f"DistEllOp(m={self.m}, k={self.cols.shape[1]})"


@jax.tree_util.register_pytree_node_class
class DistTopoTransfer:
    """Padded gather-table transfers (surface of :class:`TopoTransfer`).

    ``m_real_coarse`` (static) marks where the real coarse rows end: the
    variational R = P^T scatter must drop the weights that eliminated
    parents alias onto pad slot ``m_real_coarse``.
    """

    def __init__(self, src0, src1, inj, restrict_scale: float,
                 variational: bool, m_real_coarse: int):
        self.src0 = src0
        self.src1 = src1
        self.inj = inj
        self.restrict_scale = float(restrict_scale)
        self.variational = bool(variational)
        self.m_real_coarse = int(m_real_coarse)

    def tree_flatten(self):
        return ((self.src0, self.src1, self.inj),
                (self.restrict_scale, self.variational,
                 self.m_real_coarse))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, restrict_scale=aux[0], variational=aux[1],
                   m_real_coarse=aux[2])

    @property
    def m_fine(self) -> int:
        return self.src0.shape[0]

    @property
    def m_coarse(self) -> int:
        return self.inj.shape[0]

    def prolong(self, ec: jnp.ndarray) -> jnp.ndarray:
        half = jnp.asarray(0.5, ec.dtype)
        return half * (ec[self.src0] + ec[self.src1])

    def restrict(self, rf: jnp.ndarray) -> jnp.ndarray:
        if self.variational:
            half = jnp.asarray(0.5, rf.dtype) * rf
            acc = (jax.ops.segment_sum(half, self.src0,
                                       num_segments=self.m_coarse)
                   + jax.ops.segment_sum(half, self.src1,
                                         num_segments=self.m_coarse))
            keep = (jnp.arange(self.m_coarse) < self.m_real_coarse)
            return jnp.where(keep, acc, jnp.zeros_like(acc))
        return jnp.asarray(self.restrict_scale, rf.dtype) * rf[self.inj]

    def __repr__(self):
        return (f"DistTopoTransfer(m_f={self.m_fine}, "
                f"m_c={self.m_coarse}, real_c={self.m_real_coarse})")


def _pad_ell(op: EllOp, mp: int) -> DistEllOp:
    """Pad an EllOp from m rows to mp: the ext zero slot (column index m)
    becomes in-band pad slot m; appended rows are all-zero."""
    m, k = op.cols.shape
    cols = np.full((mp, k), m, np.int32)
    cols[:m] = np.asarray(op.cols)  # old index m == first pad slot: valid
    vals = np.zeros((mp, k), np.asarray(op.vals).dtype)
    vals[:m] = np.asarray(op.vals)
    d_inv = np.zeros((mp,), np.asarray(op.d_inv).dtype)
    d_inv[:m] = np.asarray(op.d_inv)
    return DistEllOp(jnp.asarray(cols), jnp.asarray(vals),
                     jnp.asarray(d_inv))


def _pad_transfer(t: TopoTransfer, mfp: int, mcp: int) -> DistTopoTransfer:
    mf, mc = t.m_fine, t.m_coarse
    src0 = np.full((mfp,), mc, np.int32)  # pad fine rows read coarse pad
    src1 = np.full((mfp,), mc, np.int32)
    src0[:mf] = np.asarray(t.src0)  # eliminated parents aliased mc: still
    src1[:mf] = np.asarray(t.src1)  # a (zero) pad slot in-band
    inj = np.full((mcp,), mf, np.int32)  # pad coarse rows read fine pad
    inj[:mc] = np.asarray(t.inj)
    return DistTopoTransfer(jnp.asarray(src0), jnp.asarray(src1),
                            jnp.asarray(inj), t.restrict_scale,
                            t.variational, mc)


def pad_topo_hierarchy(hier: TopoHierarchy, ndev: int):
    """Pad every level's space dimension to a multiple of ``ndev`` (with
    >= 1 pad slot).  Returns ``(padded_hierarchy, real_sizes)``."""
    ms = [op.m for op in hier.ops]
    mps = [_round_up(m + 1, ndev) for m in ms]
    ops = tuple(_pad_ell(op, mp) for op, mp in zip(hier.ops, mps))
    transfers = tuple(
        _pad_transfer(t, mps[k], mps[k + 1])
        for k, t in enumerate(hier.transfers))
    ci = np.asarray(hier.coarse_inv)
    mcl, mclp = ms[-1], mps[-1]
    ci_p = np.zeros((mclp, mclp), ci.dtype)
    ci_p[:mcl, :mcl] = ci
    b_levels = None
    if hier.b_levels is not None:
        b_levels = tuple(
            jnp.concatenate([b, jnp.zeros((mp - m,), b.dtype)])
            for b, m, mp in zip(hier.b_levels, ms, mps))
    return (TopoHierarchy(ops, transfers, jnp.asarray(ci_p), b_levels),
            tuple(ms))


def _row_shard(x, mesh: Mesh, ndev: int):
    """Shard axis 0 over the flattened mesh when it divides; replicate
    otherwise (aux scalars, anything oddly shaped)."""
    if not hasattr(x, "ndim") or x.ndim < 1 or x.shape[0] % ndev != 0:
        return jax.device_put(x, NamedSharding(mesh, P()))
    spec = [None] * x.ndim
    spec[0] = tuple(mesh.axis_names)
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def gspmd_solve_topo(hier: TopoHierarchy, b, mesh: Mesh, *,
                     num_cycles: int = 20, nu1: int = 3, nu2: int = 3,
                     omega: Union[float, Tuple[float, ...]] = 2.0 / 3.0,
                     use_fmg: bool = False, u0=None, jit: bool = True):
    """Distribute a TopoHierarchy solve over ``mesh`` (all axes flattened
    into one row-partition axis).  Same contract as
    :func:`topo.solve_topo`; returns ``(u, res_history)`` with ``u``
    sliced back to the real (unpadded) DOF count.
    """
    from ..topo import solve_topo

    ndev = int(mesh.devices.size)
    ph, real = pad_topo_hierarchy(hier, ndev)
    m0, mp0 = real[0], ph.ops[0].m
    b = jnp.asarray(b)
    b_p = jnp.concatenate([b, jnp.zeros((mp0 - m0,), b.dtype)])
    u0_p = None
    if u0 is not None:
        u0 = jnp.asarray(u0)
        u0_p = jnp.concatenate([u0, jnp.zeros((mp0 - m0,), u0.dtype)])

    ph_s = jax.tree.map(lambda x: _row_shard(x, mesh, ndev), ph)
    b_s = _row_shard(b_p, mesh, ndev)
    u0_s = None if u0_p is None else _row_shard(u0_p, mesh, ndev)

    def go(h, bb, uu):
        return solve_topo(h, bb, num_cycles=num_cycles, nu1=nu1, nu2=nu2,
                          omega=omega, use_fmg=use_fmg, u0=uu)

    if jit:
        go = jax.jit(go, static_argnames=())
    u, hist = go(ph_s, b_s, u0_s)
    return u[:m0], hist

"""Unstructured P1 triangulations -> nested general-DOF multigrid.

Completes the reference's v2 pybind intent: ``ProblemVar`` is "filled from
Python" with mesh metadata (``Multigrid_functions.cpp:2-3,16-26``) but the
repository never ships a mesh-to-metadata constructor — every consumer is
the structured unit square.  This module provides the missing front end for
*actual* triangulations:

- :class:`Triangulation`: vertices + triangles, boundary detected from edge
  incidence (edges on exactly one triangle).
- :func:`refine`: nested regular ("red") refinement — every triangle splits
  into 4 via edge midpoints — which *is* the reference's fine/coarse vertex-
  or-edge parentage model: each fine vertex is either a coarse vertex
  (``parent_info = (0, v)``) or a coarse edge midpoint (``(1, edge)``).
- :func:`build_mesh_hierarchy`: refine ``levels-1`` times, assemble every
  level from its own elements (the v2 "re-assembled per level" semantics),
  and emit reference-shaped metadata dicts through
  :func:`topo.transfer_from_metadata` — so the exact ``ProblemVar`` code
  path is what runs, now fed by a real mesh.

Restriction defaults to the variational R = P^T
(``TopoTransfer(variational=True)``): for nested P1 spaces the re-assembled
coarse operator equals the Galerkin product P^T A_f P exactly, so standard
two-grid theory applies on any shape-regular mesh — the reference's
unscaled injection (``restriction2D``, ``Multigrid_functions.cpp:122-130``)
remains available via ``variational=False``.

Everything here is host-side setup (numpy, vectorized over elements); the
solve itself runs the jit-compiled gather/ELL machinery in ``topo.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from .topo import (EllOp, TopoHierarchy, TopoTransfer, ell_from_coo,
                   transfer_from_metadata)


# ---------------------------------------------------------------------------
# Mesh container
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Triangulation:
    """A 2D P1 mesh: ``vertices`` (nv, 2) float64, ``triangles`` (nt, 3)
    int32 (counter-clockwise or clockwise; orientation-agnostic)."""

    vertices: np.ndarray
    triangles: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "vertices",
                           np.asarray(self.vertices, np.float64))
        object.__setattr__(self, "triangles",
                           np.asarray(self.triangles, np.int32))
        if self.vertices.ndim != 2 or self.vertices.shape[1] != 2:
            raise ValueError("vertices must be (nv, 2)")
        if self.triangles.ndim != 2 or self.triangles.shape[1] != 3:
            raise ValueError("triangles must be (nt, 3)")

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.triangles.shape[0]

    def __repr__(self):
        return (f"Triangulation(nv={self.num_vertices}, "
                f"nt={self.num_triangles})")


def _sorted_edges(triangles: np.ndarray) -> np.ndarray:
    """All 3*nt triangle edges as sorted (lo, hi) vertex pairs."""
    t = triangles
    e = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    return np.sort(e, axis=1)


def boundary_vertex_mask(tri: Triangulation) -> np.ndarray:
    """(nv,) bool: vertices on an edge shared by exactly one triangle.

    The mesh-driven generalization of ``boundary_nodes_indices``
    (``Poissons_SYCL.cpp:188-198``, which hard-codes the unit square's
    perimeter)."""
    e = _sorted_edges(tri.triangles)
    uniq, counts = np.unique(e, axis=0, return_counts=True)
    bnd_edges = uniq[counts == 1]
    mask = np.zeros(tri.num_vertices, bool)
    mask[bnd_edges.ravel()] = True
    return mask


# ---------------------------------------------------------------------------
# Nested refinement + reference-shaped metadata
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Refinement:
    """One nested refinement step: the fine mesh plus the parentage facts
    the reference's ``ProblemVar`` carries (``Multigrid_functions.cpp:16-26``).

    Fine vertex ids extend coarse ids: ``0..nv_c-1`` are the coarse vertices
    (so ``coincident_fine_topo`` is the identity) and ``nv_c + e`` is the
    midpoint of coarse edge ``e``."""

    fine: Triangulation
    coarse_edges: Dict[int, Tuple[int, int]]   # edge id -> (v0, v1)
    parent_info: Dict[int, Tuple[int, int]]    # fine vtx -> (0,v) | (1,e)
    num_coarse_vertices: int


def refine(tri: Triangulation) -> Refinement:
    """Regular (red) refinement: each triangle -> 4 via edge midpoints."""
    nv_c = tri.num_vertices
    e = _sorted_edges(tri.triangles)
    uniq, inverse = np.unique(e, axis=0, return_inverse=True)
    ne = uniq.shape[0]

    mids = 0.5 * (tri.vertices[uniq[:, 0]] + tri.vertices[uniq[:, 1]])
    verts_f = np.concatenate([tri.vertices, mids])

    # per-triangle midpoint ids for edges (01, 12, 20)
    nt = tri.num_triangles
    eid = inverse.reshape(3, nt).T  # column k = edge ids of slice k
    m01, m12, m20 = (nv_c + eid[:, 0], nv_c + eid[:, 1], nv_c + eid[:, 2])
    a, b, c = tri.triangles.T
    tris_f = np.concatenate([
        np.stack([a, m01, m20], axis=1),
        np.stack([b, m12, m01], axis=1),
        np.stack([c, m20, m12], axis=1),
        np.stack([m01, m12, m20], axis=1),
    ])

    coarse_edges = {int(i): (int(uniq[i, 0]), int(uniq[i, 1]))
                    for i in range(ne)}
    parent_info: Dict[int, Tuple[int, int]] = {}
    for v in range(nv_c):
        parent_info[v] = (0, v)
    for i in range(ne):
        parent_info[nv_c + i] = (1, i)

    return Refinement(Triangulation(verts_f, tris_f), coarse_edges,
                      parent_info, nv_c)


# ---------------------------------------------------------------------------
# Vectorized P1 assembly on an arbitrary mesh
# ---------------------------------------------------------------------------

def space_map(dirichlet: np.ndarray) -> np.ndarray:
    """(nv,) int32: vertex -> interior space dof, -1 for eliminated
    (Dirichlet) vertices.  Interior dofs numbered in vertex-id order — any
    other numbering is equivalent via topo.py's ``topo_to_space`` maps."""
    m = np.cumsum(~dirichlet) - 1
    return np.where(dirichlet, -1, m).astype(np.int32)


def assemble_p1(tri: Triangulation,
                f: Union[float, Callable] = 1.0,
                dirichlet: Optional[np.ndarray] = None):
    """Element assembly over the whole mesh, vectorized (one numpy pass).

    Same per-element math as ``core.fem.triangle_stiffness`` /
    ``triangle_load`` (the reference's ``triangle_element_stiffness_matrix``
    / ``force_function_element``, ``Poissons_SYCL.cpp:149-186``) batched
    over all nt triangles.  Returns COO triplets over interior space dofs,
    the load vector, and the vertex->dof map:
    ``(rows, cols, vals, b, space)`` with ``m = space.max() + 1``.
    """
    if dirichlet is None:
        dirichlet = boundary_vertex_mask(tri)
    space = space_map(dirichlet)
    m = int(space.max()) + 1 if np.any(space >= 0) else 0

    pts = tri.vertices[tri.triangles]          # (nt, 3, 2)
    x, y = pts[..., 0], pts[..., 1]
    beta = np.stack([y[:, 1] - y[:, 2], y[:, 2] - y[:, 0],
                     y[:, 0] - y[:, 1]], axis=1)
    gamma = np.stack([x[:, 2] - x[:, 1], x[:, 0] - x[:, 2],
                      x[:, 1] - x[:, 0]], axis=1)
    area2 = np.einsum("ti,ti->t", x, beta)     # signed 2|T|
    area = np.abs(area2) / 2.0
    if np.any(area == 0.0):
        raise ValueError("degenerate triangle in mesh")
    ke = ((beta[:, :, None] * beta[:, None, :]
           + gamma[:, :, None] * gamma[:, None, :])
          / (4.0 * area)[:, None, None])       # (nt, 3, 3)

    centroid = pts.mean(axis=1)
    if callable(f):
        fv = np.asarray(f(centroid[:, 0], centroid[:, 1]), np.float64)
    else:
        fv = np.full(tri.num_triangles, float(f))
    fe = (fv * area / 3.0)[:, None] * np.ones((1, 3))  # (nt, 3)

    ids = space[tri.triangles]                 # (nt, 3), -1 = eliminated
    rows = np.repeat(ids, 3, axis=1).ravel()   # entry a*3+b: (ids_a, ids_b)
    cols = np.tile(ids, (1, 3)).ravel()
    vals = ke.reshape(tri.num_triangles, 9).ravel()
    live = (rows >= 0) & (cols >= 0)

    b = np.zeros(m)
    flat_ids = ids.ravel()
    good = flat_ids >= 0
    np.add.at(b, flat_ids[good], fe.ravel()[good])
    return rows[live], cols[live], vals[live], b, space


def assemble_dense(tri: Triangulation,
                   f: Union[float, Callable] = 1.0,
                   dirichlet: Optional[np.ndarray] = None):
    """Dense (m, m) stiffness + load (small meshes / oracles / coarse-level
    direct inverse)."""
    rows, cols, vals, b, space = assemble_p1(tri, f, dirichlet)
    m = b.shape[0]
    A = np.zeros((m, m))
    np.add.at(A, (rows, cols), vals)
    return A, b, space


# ---------------------------------------------------------------------------
# Hierarchy construction
# ---------------------------------------------------------------------------

def build_mesh_hierarchy(
    coarse: Triangulation,
    levels: int,
    f: Union[float, Callable] = 1.0,
    *,
    variational: bool = True,
    restrict_scale: float = 4.0,
    dtype=jnp.float32,
) -> Tuple[TopoHierarchy, List[Triangulation]]:
    """Refine ``levels - 1`` times and build a general-DOF hierarchy.

    Every level is element-assembled on its own mesh (v2 "re-assembled"
    semantics, ``Multigrid_functions.cpp:175-191``); transfers go through
    :func:`topo.transfer_from_metadata` fed with the refinement's
    reference-shaped dicts — the end-to-end ``ProblemVar`` path from a real
    triangulation.  Returns ``(hierarchy, meshes)`` with ``meshes`` ordered
    finest first (matching ``hierarchy.ops``).
    """
    if levels < 2:
        raise ValueError("need at least 2 levels")
    meshes = [coarse]
    refs: List[Refinement] = []
    for _ in range(levels - 1):
        r = refine(meshes[-1])
        refs.append(r)
        meshes.append(r.fine)
    meshes_ff = meshes[::-1]                   # finest first
    refs_ff = refs[::-1]

    dir_masks = [boundary_vertex_mask(t) for t in meshes_ff]
    spaces = [space_map(d) for d in dir_masks]

    ops: List[EllOp] = []
    bs: List[jnp.ndarray] = []
    for t, d in zip(meshes_ff, dir_masks):
        rows, cols, vals, b, _ = assemble_p1(t, f, d)
        ops.append(ell_from_coo(rows, cols, vals, b.shape[0]))
        bs.append(jnp.asarray(b, dtype))

    transfers: List[TopoTransfer] = []
    for k, r in enumerate(refs_ff):
        sf, sc = spaces[k], spaces[k + 1]
        t2s_f = {int(v): int(sf[v]) for v in range(len(sf))}
        t2s_c = {int(v): int(sc[v]) for v in range(len(sc))}
        coincident = {v: v for v in range(r.num_coarse_vertices)}
        transfers.append(transfer_from_metadata(
            r.parent_info, r.coarse_edges, t2s_f, t2s_c, coincident,
            m_fine=int(sf.max()) + 1, m_coarse=int(sc.max()) + 1,
            restrict_scale=restrict_scale, variational=variational))

    A_c, _, _ = assemble_dense(meshes_ff[-1], f, dir_masks[-1])
    coarse_inv = jnp.asarray(np.linalg.inv(A_c), dtype)
    return (TopoHierarchy(tuple(ops), tuple(transfers), coarse_inv,
                          tuple(bs)), meshes_ff)


# ---------------------------------------------------------------------------
# Canonical example meshes
# ---------------------------------------------------------------------------

def unit_square_mesh(n: int = 1) -> Triangulation:
    """The criss-cross unit square as a Triangulation (n cells per side) —
    the structured solver's mesh, expressed unstructured (oracle tests
    compare the two assemblies entry-for-entry)."""
    ii, jj = np.meshgrid(np.arange(n + 1), np.arange(n + 1), indexing="ij")
    verts = np.stack([jj.ravel() / n, ii.ravel() / n], axis=1)
    tris = []
    for i in range(n):
        for j in range(n):
            sw, se = i * (n + 1) + j, i * (n + 1) + j + 1
            nw, ne = (i + 1) * (n + 1) + j, (i + 1) * (n + 1) + j + 1
            tris.append([sw, se, nw])
            tris.append([ne, nw, se])
    return Triangulation(verts, np.asarray(tris))


def lshape_mesh() -> Triangulation:
    """Coarse L-shaped domain [0,2]^2 minus (1,2)x(1,2): 8 vertices, 6
    triangles — the classic re-entrant-corner benchmark mesh."""
    verts = np.array([
        [0.0, 0.0], [1.0, 0.0], [2.0, 0.0],
        [0.0, 1.0], [1.0, 1.0], [2.0, 1.0],
        [0.0, 2.0], [1.0, 2.0],
    ])
    tris = np.array([
        [0, 1, 3], [4, 3, 1],     # cell (0,0)
        [1, 2, 4], [5, 4, 2],     # cell (0,1)
        [3, 4, 6], [7, 6, 4],     # cell (1,0)
    ])
    return Triangulation(verts, tris)

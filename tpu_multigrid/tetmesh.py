"""Unstructured P1 tetrahedralizations -> nested general-DOF multigrid.

The 3D twin of ``trimesh.py``, completing the reference's v2 ``ProblemVar``
intent (``Multigrid_functions.cpp:2-3,16-26``) one dimension up: the topo
machinery (gather-table transfers, ELL operators, ``vcycle_topo``/
``fmg_topo`` drivers) is dimension-agnostic — a fine vertex is either a
coarse vertex or a coarse EDGE midpoint in any dimension, so
``topo.transfer_from_metadata`` consumes tetrahedral refinements unchanged.
Only the construction front end is new:

- :class:`Tetrahedralization`: vertices + tets, boundary detected from face
  incidence (faces on exactly one tet).
- :func:`refine3`: Bey's regular ("red") refinement — each tet splits into
  8 (4 corner tets + 4 octahedron tets sharing the fixed m_ac–m_bd
  diagonal).  Nestedness of the P1 spaces holds for ANY diagonal choice
  (coarse-P1 functions are linear on every sub-tet); the fixed choice keeps
  refinement deterministic.
- :func:`assemble_p1_tet`: vectorized element assembly — per-tet barycentric
  gradients from one batched 3x3 inverse, ``K_e[a,b] = V grad_a . grad_b``,
  load ``f(centroid) V / 4``.
- :func:`build_tetmesh_hierarchy`: refine, assemble every level from its
  own elements (v2 re-assembled semantics), variational R = P^T transfers
  (for nested P1 the re-assembled coarse operator equals the Galerkin
  product exactly — tested to roundoff).

Everything here is host-side numpy setup; solves run the jit-compiled
``topo.py`` machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from .topo import (EllOp, TopoHierarchy, TopoTransfer, ell_from_coo,
                   transfer_from_metadata)
from .trimesh import space_map


# ---------------------------------------------------------------------------
# Mesh container
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Tetrahedralization:
    """A 3D P1 mesh: ``vertices`` (nv, 3) float64, ``tets`` (nt, 4) int32
    (orientation-agnostic)."""

    vertices: np.ndarray
    tets: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "vertices",
                           np.asarray(self.vertices, np.float64))
        object.__setattr__(self, "tets", np.asarray(self.tets, np.int32))
        if self.vertices.ndim != 2 or self.vertices.shape[1] != 3:
            raise ValueError("vertices must be (nv, 3)")
        if self.tets.ndim != 2 or self.tets.shape[1] != 4:
            raise ValueError("tets must be (nt, 4)")

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_tets(self) -> int:
        return self.tets.shape[0]

    def __repr__(self):
        return (f"Tetrahedralization(nv={self.num_vertices}, "
                f"nt={self.num_tets})")


def _sorted_faces(tets: np.ndarray) -> np.ndarray:
    """All 4*nt tet faces as sorted (lo, mid, hi) vertex triples."""
    t = tets
    f = np.concatenate([t[:, [1, 2, 3]], t[:, [0, 2, 3]],
                        t[:, [0, 1, 3]], t[:, [0, 1, 2]]])
    return np.sort(f, axis=1)


def boundary_vertex_mask3(tet: Tetrahedralization) -> np.ndarray:
    """(nv,) bool: vertices on a face shared by exactly one tet."""
    f = _sorted_faces(tet.tets)
    uniq, counts = np.unique(f, axis=0, return_counts=True)
    bnd = uniq[counts == 1]
    mask = np.zeros(tet.num_vertices, bool)
    mask[bnd.ravel()] = True
    return mask


def _sorted_edges3(tets: np.ndarray) -> np.ndarray:
    """All 6*nt tet edges as sorted (lo, hi) vertex pairs."""
    t = tets
    e = np.concatenate([t[:, [0, 1]], t[:, [0, 2]], t[:, [0, 3]],
                        t[:, [1, 2]], t[:, [1, 3]], t[:, [2, 3]]])
    return np.sort(e, axis=1)


# ---------------------------------------------------------------------------
# Nested (Bey red) refinement + reference-shaped metadata
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Refinement3:
    """One nested refinement step (same parentage schema as 2D
    ``trimesh.Refinement``: fine vertex = coarse vertex | edge midpoint)."""

    fine: Tetrahedralization
    coarse_edges: Dict[int, Tuple[int, int]]
    parent_info: Dict[int, Tuple[int, int]]
    num_coarse_vertices: int


def refine3(tet: Tetrahedralization) -> Refinement3:
    """Bey's regular refinement: each tet (a,b,c,d) -> 4 corner tets +
    4 octahedron tets on the m_ac–m_bd diagonal."""
    nv_c = tet.num_vertices
    e = _sorted_edges3(tet.tets)
    uniq, inverse = np.unique(e, axis=0, return_inverse=True)
    ne = uniq.shape[0]

    mids = 0.5 * (tet.vertices[uniq[:, 0]] + tet.vertices[uniq[:, 1]])
    verts_f = np.concatenate([tet.vertices, mids])

    nt = tet.num_tets
    eid = inverse.reshape(6, nt).T   # columns: ab, ac, ad, bc, bd, cd
    mab, mac, mad, mbc, mbd, mcd = (nv_c + eid[:, k] for k in range(6))
    a, b, c, d = tet.tets.T
    tets_f = np.concatenate([
        np.stack([a, mab, mac, mad], axis=1),
        np.stack([mab, b, mbc, mbd], axis=1),
        np.stack([mac, mbc, c, mcd], axis=1),
        np.stack([mad, mbd, mcd, d], axis=1),
        # octahedron (Bey, diagonal mac–mbd)
        np.stack([mab, mac, mad, mbd], axis=1),
        np.stack([mab, mac, mbc, mbd], axis=1),
        np.stack([mac, mad, mbd, mcd], axis=1),
        np.stack([mac, mbc, mbd, mcd], axis=1),
    ])

    coarse_edges = {int(i): (int(uniq[i, 0]), int(uniq[i, 1]))
                    for i in range(ne)}
    parent_info: Dict[int, Tuple[int, int]] = {}
    for v in range(nv_c):
        parent_info[v] = (0, v)
    for i in range(ne):
        parent_info[nv_c + i] = (1, i)

    return Refinement3(Tetrahedralization(verts_f, tets_f), coarse_edges,
                       parent_info, nv_c)


# ---------------------------------------------------------------------------
# Vectorized P1 assembly on an arbitrary tet mesh
# ---------------------------------------------------------------------------

def assemble_p1_tet(tet: Tetrahedralization,
                    f: Union[float, Callable] = 1.0,
                    dirichlet: Optional[np.ndarray] = None):
    """Element assembly over the whole mesh, vectorized (one numpy pass).

    Per-tet: with M = [p1-p0; p2-p0; p3-p0] (rows), the barycentric
    gradients are ``grad lam_i = column i of M^{-1}`` (i = 1..3) and
    ``grad lam_0 = -(sum)``; ``K_e[a,b] = V grad_a . grad_b`` with
    ``V = |det M| / 6``; load ``f(centroid) V / 4`` per vertex.  Returns
    COO triplets over interior space dofs, the load vector, and the
    vertex->dof map.
    """
    if dirichlet is None:
        dirichlet = boundary_vertex_mask3(tet)
    space = space_map(dirichlet)
    m = int(space.max()) + 1 if np.any(space >= 0) else 0

    pts = tet.vertices[tet.tets]               # (nt, 4, 3)
    M = pts[:, 1:] - pts[:, :1]                # (nt, 3, 3) rows = edges
    det = np.linalg.det(M)
    if np.any(det == 0.0):
        raise ValueError("degenerate tet in mesh")
    vol = np.abs(det) / 6.0
    Minv = np.linalg.inv(M)                    # (nt, 3, 3)
    g123 = np.swapaxes(Minv, 1, 2)             # (nt, 3, 3): row i = grad_i+1
    g0 = -g123.sum(axis=1, keepdims=True)      # (nt, 1, 3)
    grads = np.concatenate([g0, g123], axis=1)  # (nt, 4, 3)
    ke = np.einsum("tad,tbd->tab", grads, grads) * vol[:, None, None]

    centroid = pts.mean(axis=1)
    if callable(f):
        fv = np.asarray(f(centroid[:, 0], centroid[:, 1], centroid[:, 2]),
                        np.float64)
    else:
        fv = np.full(tet.num_tets, float(f))
    fe = (fv * vol / 4.0)[:, None] * np.ones((1, 4))

    ids = space[tet.tets]                      # (nt, 4)
    rows = np.repeat(ids, 4, axis=1).ravel()
    cols = np.tile(ids, (1, 4)).ravel()
    vals = ke.reshape(tet.num_tets, 16).ravel()
    live = (rows >= 0) & (cols >= 0)

    bvec = np.zeros(m)
    flat = ids.ravel()
    good = flat >= 0
    np.add.at(bvec, flat[good], fe.ravel()[good])
    return rows[live], cols[live], vals[live], bvec, space


def assemble_dense_tet(tet: Tetrahedralization,
                       f: Union[float, Callable] = 1.0,
                       dirichlet: Optional[np.ndarray] = None):
    """Dense (m, m) stiffness + load (oracles / coarse direct inverse)."""
    rows, cols, vals, b, space = assemble_p1_tet(tet, f, dirichlet)
    m = b.shape[0]
    A = np.zeros((m, m))
    np.add.at(A, (rows, cols), vals)
    return A, b, space


# ---------------------------------------------------------------------------
# Hierarchy construction
# ---------------------------------------------------------------------------

def build_tetmesh_hierarchy(
    coarse: Tetrahedralization,
    levels: int,
    f: Union[float, Callable] = 1.0,
    *,
    variational: bool = True,
    restrict_scale: float = 8.0,
    dtype=jnp.float32,
) -> Tuple[TopoHierarchy, List[Tetrahedralization]]:
    """Refine ``levels - 1`` times and build a general-DOF 3D hierarchy.

    Every level is element-assembled on its own mesh; transfers run
    through ``topo.transfer_from_metadata`` on the refinement's
    reference-shaped dicts.  ``restrict_scale`` (non-variational
    injection only) defaults to 8.0 — the 3D row-sum heuristic
    (R = P^T maps constants c -> 8c in 3D, the ``2^d`` analogue of the
    2D 4.0); the variational default sidesteps it entirely.  Returns
    ``(hierarchy, meshes)`` finest first.
    """
    if levels < 2:
        raise ValueError("need at least 2 levels")
    meshes = [coarse]
    refs: List[Refinement3] = []
    for _ in range(levels - 1):
        r = refine3(meshes[-1])
        refs.append(r)
        meshes.append(r.fine)
    meshes_ff = meshes[::-1]
    refs_ff = refs[::-1]

    dir_masks = [boundary_vertex_mask3(t) for t in meshes_ff]
    spaces = [space_map(d) for d in dir_masks]

    ops: List[EllOp] = []
    bs: List[jnp.ndarray] = []
    for t, d in zip(meshes_ff, dir_masks):
        rows, cols, vals, b, _ = assemble_p1_tet(t, f, d)
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

    A_c, _, _ = assemble_dense_tet(meshes_ff[-1], f, dir_masks[-1])
    coarse_inv = jnp.asarray(np.linalg.inv(A_c), dtype)
    return (TopoHierarchy(tuple(ops), tuple(transfers), coarse_inv,
                          tuple(bs)), meshes_ff)


# ---------------------------------------------------------------------------
# Canonical example meshes
# ---------------------------------------------------------------------------

def unit_cube_mesh(n: int = 1) -> Tetrahedralization:
    """The Kuhn (6-tets-per-cell) unit cube with n cells per side: every
    tet contains the cell's main diagonal — the standard structured
    tetrahedralization (and the 3D twin of ``trimesh.unit_square_mesh``)."""
    idx = np.arange((n + 1) ** 3).reshape(n + 1, n + 1, n + 1)
    g = np.linspace(0.0, 1.0, n + 1)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    verts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=1)
    # Kuhn: 6 permutations of the path corner(0,0,0) -> (1,1,1)
    paths = [((0, 0, 1), (0, 1, 1)), ((0, 0, 1), (1, 0, 1)),
             ((0, 1, 0), (0, 1, 1)), ((0, 1, 0), (1, 1, 0)),
             ((1, 0, 0), (1, 0, 1)), ((1, 0, 0), (1, 1, 0))]
    tets = []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                v000 = idx[i, j, k]
                v111 = idx[i + 1, j + 1, k + 1]
                for (p1, p2) in paths:
                    a = idx[i + p1[0], j + p1[1], k + p1[2]]
                    b = idx[i + p2[0], j + p2[1], k + p2[2]]
                    tets.append([v000, a, b, v111])
    return Tetrahedralization(verts, np.asarray(tets))


def fichera_mesh() -> Tetrahedralization:
    """The Fichera corner [0,2]^3 minus [1,2]^3 (7 unit cubes, Kuhn
    6-tet each) — the classic 3D re-entrant-corner benchmark domain."""
    cube = unit_cube_mesh(1)
    verts_all: List[np.ndarray] = []
    tets_all: List[np.ndarray] = []
    seen: Dict[Tuple[float, float, float], int] = {}
    for oz in (0, 1):
        for oy in (0, 1):
            for ox in (0, 1):
                if (ox, oy, oz) == (1, 1, 1):
                    continue
                shift = np.array([ox, oy, oz], np.float64)
                local = cube.vertices + shift
                ids = np.zeros(local.shape[0], np.int64)
                for t, p in enumerate(local):
                    key = (round(p[0], 9), round(p[1], 9), round(p[2], 9))
                    if key not in seen:
                        seen[key] = len(verts_all)
                        verts_all.append(p)
                    ids[t] = seen[key]
                tets_all.append(ids[cube.tets])
    return Tetrahedralization(np.asarray(verts_all),
                              np.concatenate(tets_all))

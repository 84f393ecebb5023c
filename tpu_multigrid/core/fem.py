"""P1 finite-element building blocks (element level).

The compute path never materializes element matrices (on the structured
criss-cross mesh the assembled stiffness *is* the 5-point stencil), but the
element-level quantities are part of the framework's capability surface,
mirroring the reference's ``triangle_element_stiffness_matrix``
(``Poissons_SYCL.cpp:149-173``) and ``force_function_element``
(``:175-186``), and serve as an independent assembly oracle: see
``assemble_from_elements``.
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

import numpy as np


def triangle_stiffness(coords: np.ndarray) -> np.ndarray:
    """3x3 P1 element stiffness matrix for a triangle.

    ``coords``: (3, 2) vertex coordinates.  K_ij = (b_i b_j + g_i g_j) /
    (4 |T|) with b/g the usual P1 gradient coefficients — the same beta/gamma
    construction as the reference (``Poissons_SYCL.cpp:149-173``).
    """
    coords = np.asarray(coords, np.float64)
    x, y = coords[:, 0], coords[:, 1]
    beta = np.array([y[1] - y[2], y[2] - y[0], y[0] - y[1]])
    gamma = np.array([x[2] - x[1], x[0] - x[2], x[1] - x[0]])
    area2 = x[0] * beta[0] + x[1] * beta[1] + x[2] * beta[2]  # 2*|T| signed
    area = abs(area2) / 2.0
    if area == 0.0:
        raise ValueError("degenerate triangle")
    return (np.outer(beta, beta) + np.outer(gamma, gamma)) / (4.0 * area)


def triangle_load(coords: np.ndarray, f: float) -> np.ndarray:
    """P1 element load vector: f * |T| / 3 per vertex
    (``force_function_element``, ``Poissons_SYCL.cpp:175-186``)."""
    coords = np.asarray(coords, np.float64)
    x, y = coords[:, 0], coords[:, 1]
    area = abs((x[1] - x[0]) * (y[2] - y[0])
               - (x[2] - x[0]) * (y[1] - y[0])) / 2.0
    return np.full(3, f * area / 3.0)


def unit_square_triangles(n: int):
    """The structured criss-cross triangulation of the unit square:
    2 n^2 right triangles; yields (global_node_ids(3,), coords(3,2)).

    Node (i, j) has id i*(n+1)+j; the cell (i, j) splits along its
    SW-NE... along the diagonal from (i+1, j) to (i, j+1) — two triangles:
    lower {(i,j),(i+1,j),(i,j+1)} and upper {(i+1,j+1),(i,j+1),(i+1,j)}
    (the reference's odd/even element sweeps, ``Poissons_SYCL.cpp:208-280``).
    """
    h = 1.0 / n
    for i in range(n):
        for j in range(n):
            sw, se = i * (n + 1) + j, i * (n + 1) + j + 1
            nw, ne = (i + 1) * (n + 1) + j, (i + 1) * (n + 1) + j + 1
            csw = np.array([[j * h, i * h], [(j + 1) * h, i * h],
                            [j * h, (i + 1) * h]])
            yield np.array([sw, se, nw]), csw
            cne = np.array([[(j + 1) * h, (i + 1) * h],
                            [j * h, (i + 1) * h], [(j + 1) * h, i * h]])
            yield np.array([ne, nw, se]), cne


def assemble_from_elements(n: int, f: Union[float, Callable] = 4.0
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Element-by-element global assembly with Dirichlet elimination.

    Returns (A, b): dense (m, m) interior stiffness and (m,) load vector,
    m = (n-1)^2.  This is the reference's assembly algorithm
    (``globalstiffenssmatrix``/``globalforcefunction``,
    ``Poissons_SYCL.cpp:200-335``) done correctly (float accumulation, no
    index gymnastics); used as a third independent oracle beside the
    closed-form stencil and the native C++ library.
    """
    m = (n - 1) ** 2
    A = np.zeros((m, m))
    b = np.zeros(m)

    def interior_id(g: int) -> int:
        i, j = divmod(g, n + 1)
        if 1 <= i <= n - 1 and 1 <= j <= n - 1:
            return (i - 1) * (n - 1) + (j - 1)
        return -1

    for nodes, coords in unit_square_triangles(n):
        ke = triangle_stiffness(coords)
        if callable(f):
            centroid = coords.mean(axis=0)
            fv = float(f(centroid[0], centroid[1]))
        else:
            fv = float(f)
        fe = triangle_load(coords, fv)
        ids = [interior_id(g) for g in nodes]
        for a_ in range(3):
            if ids[a_] < 0:
                continue
            b[ids[a_]] += fe[a_]
            for b_ in range(3):
                if ids[b_] >= 0:
                    A[ids[a_], ids[b_]] += ke[a_, b_]
    return A, b

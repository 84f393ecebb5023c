"""Solve -Laplace(u) = 1 on the Fichera corner from a real tet mesh.

The 3D general-DOF path end-to-end: a coarse tetrahedralization is
Bey-red-refined, each level is element-assembled, and the reference-shaped
``ProblemVar`` metadata (``Multigrid_functions.cpp:16-26``) becomes static
gather tables driving jit-compiled V-cycles — the same dimension-agnostic
machinery the 2D example uses (tpu_multigrid/topo.py).

Run: ``python examples/unstructured_tetmesh.py``
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid.tetmesh import build_tetmesh_hierarchy, fichera_mesh
from tpu_multigrid.topo import solve_topo


def main():
    levels = 4
    hier, meshes = build_tetmesh_hierarchy(fichera_mesh(), levels, f=1.0,
                                           dtype=jnp.float32)
    fine = meshes[0]
    print(f"Fichera hierarchy: {levels} levels, finest {fine} "
          f"({hier.ops[0].m} unknowns)")

    b = hier.b_levels[0]
    u, hist = jax.jit(lambda h, bb: solve_topo(h, bb, num_cycles=10))(
        hier, b)
    h = np.asarray(hist)
    print("relative residuals:", " ".join(f"{x / h[0]:.2e}" for x in h))
    print(f"max u = {float(jnp.max(u)):.6f}")


if __name__ == "__main__":
    main()

"""Solve -Laplace(u) = 1 on an L-shaped domain from a real triangulation.

The general-DOF path end-to-end: a coarse unstructured mesh is nested-
refined, each level is element-assembled, and the reference-shaped
``ProblemVar`` metadata (``Multigrid_functions.cpp:16-26``) becomes static
gather tables driving jit-compiled V-cycles (tpu_multigrid/topo.py).

Run: ``python examples/unstructured_mesh.py``
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_multigrid.topo import solve_topo
from tpu_multigrid.trimesh import build_mesh_hierarchy, lshape_mesh


def main():
    levels = 5
    hier, meshes = build_mesh_hierarchy(lshape_mesh(), levels, f=1.0,
                                        dtype=jnp.float32)
    fine = meshes[0]
    print(f"L-shape hierarchy: {levels} levels, finest {fine} "
          f"({hier.ops[0].m} unknowns)")

    b = hier.b_levels[0]
    u, hist = jax.jit(lambda h, bb: solve_topo(h, bb, num_cycles=10))(
        hier, b)
    h = np.asarray(hist)
    print("relative residuals:", " ".join(f"{x / h[0]:.2e}" for x in h))
    print(f"max u = {float(jnp.max(u)):.6f}")


if __name__ == "__main__":
    main()

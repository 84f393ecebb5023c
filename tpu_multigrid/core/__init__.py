from . import ops
from .grids import (Hierarchy, build_galerkin_hierarchy,
                    build_poisson_hierarchy, coarse_dense_inverse,
                    coarse_solve, level_sizes, node_coordinates)
from .operators import (ConstStencilOp, VarStencilOp, diffusion_op,
                        galerkin_coarsen, poisson_op)

__all__ = [
    "ops", "Hierarchy", "build_poisson_hierarchy", "build_galerkin_hierarchy",
    "coarse_dense_inverse", "coarse_solve", "level_sizes", "node_coordinates",
    "ConstStencilOp", "VarStencilOp", "poisson_op", "diffusion_op",
    "galerkin_coarsen",
]

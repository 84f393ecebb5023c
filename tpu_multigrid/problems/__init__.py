from .poisson import PoissonProblem, poisson_rhs
from .diffusion import DiffusionProblem

__all__ = ["PoissonProblem", "poisson_rhs", "DiffusionProblem"]

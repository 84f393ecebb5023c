from .poisson import PoissonProblem, poisson_rhs
from .poisson3d import Poisson3DProblem, poisson3d_rhs
from .diffusion import DiffusionProblem
from .mixedbc import MixedBCPoissonProblem
from .mixedbc3d import MixedBC3DPoissonProblem
from .anisotropic import AnisotropicPoissonProblem
from .anisotropic3d import AnisotropicPoisson3DProblem
from .helmholtz import HelmholtzProblem
from .diffusion3d import Diffusion3DProblem
from .convection import ConvectionDiffusionProblem
from .convection3d import ConvectionDiffusion3DProblem
from .periodic import PeriodicPoissonProblem
from .periodic3d import Periodic3DPoissonProblem
from .poisson4 import Poisson4Problem
from .bratu import BratuProblem, NonlinearPoissonProblem
from .nldiffusion import QuasilinearDiffusionProblem

__all__ = ["PoissonProblem", "poisson_rhs", "DiffusionProblem",
           "Poisson3DProblem", "poisson3d_rhs", "MixedBCPoissonProblem",
           "MixedBC3DPoissonProblem",
           "AnisotropicPoissonProblem", "AnisotropicPoisson3DProblem",
           "HelmholtzProblem",
           "Diffusion3DProblem", "ConvectionDiffusionProblem",
           "Poisson4Problem", "PeriodicPoissonProblem",
           "ConvectionDiffusion3DProblem", "Periodic3DPoissonProblem",
           "BratuProblem", "NonlinearPoissonProblem",
           "QuasilinearDiffusionProblem"]

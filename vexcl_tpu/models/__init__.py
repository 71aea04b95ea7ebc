"""Application models built on the framework: the reference's flagship
workloads (Lorenz ensemble, Poisson CG, Monte-Carlo) as reusable classes."""

from .lorenz import LorenzEnsemble
from .montecarlo import estimate_pi, gbm_terminal_mean
from .poisson import PoissonSolver

"""Poisson-solver model: the reference's canonical SpMV workload
(benchmark.cpp:353-478, tests/spmv.cpp) wrapped as an end-to-end
conjugate-gradient solve on the 7-point Laplacian, fully on device."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .. import Context, SpMat, current_context, vector
from ..interop import cg
from ..utils.poisson import poisson_7pt


class PoissonSolver:
    """CG solve of -∇²u = f on an n³ grid (Dirichlet), DIA-format SpMV."""

    def __init__(self, n: int, dtype=np.float32, *, context: Optional[Context] = None):
        self.context = context or current_context()
        self.n = n
        ptr, col, val = poisson_7pt(n, dtype=dtype)
        self.A = SpMat(n ** 3, n ** 3, ptr, col, val, context=self.context)

    def solve(
        self, f: np.ndarray, tol: float = 1e-6, maxiter: Optional[int] = None
    ) -> Tuple[vector, int]:
        b = vector(data=np.ravel(f), context=self.context,
                   dtype=self.A.dtype)
        return cg(self.A, b, tol=tol, maxiter=maxiter)

"""End-to-end model tests (Lorenz / Poisson / Monte-Carlo)."""

import numpy as np
import pytest

import vexcl_tpu as vex
from vexcl_tpu.models import LorenzEnsemble, PoissonSolver, estimate_pi


def test_lorenz_ensemble(ctx):
    m = LorenzEnsemble(256, dtype=np.float64, context=ctx)
    x0, _, _ = m.state()
    m.step(10)
    x1, y1, z1 = m.state()
    assert np.all(np.isfinite(x1))
    assert not np.allclose(x0, x1)


def test_poisson_solver(ctx):
    solver = PoissonSolver(8, dtype=np.float64, context=ctx)
    f = np.ones(8 ** 3)
    u, iters = solver.solve(f, tol=1e-8, maxiter=1000)
    # residual check through the library's own SpMV
    r = f - np.asarray(vex.eval(solver.A * u))
    assert np.linalg.norm(r) / np.linalg.norm(f) < 1e-5
    assert iters > 0


def test_estimate_pi(ctx):
    pi = estimate_pi(1 << 18, context=ctx, dtype=np.float64)
    assert abs(pi - np.pi) < 0.05

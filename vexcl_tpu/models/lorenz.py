"""Lorenz-ensemble ODE model — the reference's flagship workload.

The published comparison for the reference (SIAM SISC 35.5, cited in
docs/talks.rst:40-48) is a Lorenz-attractor parameter sweep integrated
with RK4; examples/symbolic.cpp builds it via the symbolic generator.
This model packages the same workload against the vexcl_tpu API: one
recorded RK4 step over symbolic state -> one fused kernel per ensemble
step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .. import Context, current_context, vector
from .. import generator


class LorenzEnsemble:
    def __init__(
        self,
        n: int,
        r_min: float = 0.1,
        r_max: float = 50.0,
        sigma: float = 10.0,
        b: float = 8.0 / 3.0,
        dt: float = 0.01,
        dtype=np.float32,
        *,
        context: Optional[Context] = None,
        seed: int = 0,
    ):
        self.context = context or current_context()
        self.n = n
        self.dt = dt
        rng = np.random.default_rng(seed)
        self.x = vector(data=rng.random(n) * 10, dtype=dtype, context=self.context)
        self.y = vector(data=rng.random(n) * 10, dtype=dtype, context=self.context)
        self.z = vector(data=rng.random(n) * 10, dtype=dtype, context=self.context)
        self.R = vector(
            data=np.linspace(r_min, r_max, n), dtype=dtype, context=self.context
        )

        def sys_fn(state, R):
            x, y, z = state
            return (sigma * (y - x), R * x - y - x * z, x * y - b * z)

        sx, sy, sz, sR = (generator.symbolic() for _ in range(4))
        nx, ny, nz = self._rk4(sys_fn, (sx, sy, sz), sR, dt)
        sx.assign(nx)
        sy.assign(ny)
        sz.assign(nz)
        self._step = generator.build_kernel(
            "lorenz_rk4", [sx, sy, sz], params=[sx, sy, sz, sR]
        )

    @staticmethod
    def _rk4(sys_fn, state, R, dt):
        k1 = sys_fn(state, R)
        s2 = tuple(s + 0.5 * dt * k for s, k in zip(state, k1))
        k2 = sys_fn(s2, R)
        s3 = tuple(s + 0.5 * dt * k for s, k in zip(state, k2))
        k3 = sys_fn(s3, R)
        s4 = tuple(s + dt * k for s, k in zip(state, k3))
        k4 = sys_fn(s4, R)
        return tuple(
            s + dt / 6.0 * (a + 2 * b_ + 2 * c + d)
            for s, a, b_, c, d in zip(state, k1, k2, k3, k4)
        )

    def step(self, nsteps: int = 1) -> None:
        for _ in range(nsteps):
            self._step(self.x, self.y, self.z, self.R)

    def state(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self.x.to_numpy(), self.y.to_numpy(), self.z.to_numpy()

"""Monte-Carlo model: counter-based RNG driving estimation entirely on
device — the reference's canonical Random() use-case (docs/random
examples: MC pi) generalized to path simulation."""

from __future__ import annotations

from typing import Optional

import numpy as np

from .. import Context, Random, Reductor, SUM, current_context, element_index, if_else


def estimate_pi(n: int = 1 << 24, seed: int = 42, *,
                context: Optional[Context] = None,
                dtype=np.float32) -> float:
    """MC estimate of pi: n dart throws, RNG + test + reduce in ONE fused
    kernel."""
    _ = context or current_context()
    rnd = Random(dtype)
    i = element_index(0, n)
    x = rnd(i, seed)
    y = rnd(i, seed + 1)
    inside = Reductor(SUM)(if_else(x * x + y * y < 1.0, 1.0, 0.0))
    return 4.0 * inside / n


def gbm_terminal_mean(
    n_paths: int = 1 << 20,
    n_steps: int = 64,
    s0: float = 100.0,
    mu: float = 0.05,
    sigma: float = 0.2,
    dt: float = 1.0 / 64,
    seed: int = 7,
    *,
    context: Optional[Context] = None,
) -> float:
    """Mean terminal value of geometric Brownian motion paths; each step is
    one fused kernel (RandomNormal terminal + update expression)."""
    from .. import RandomNormal, vector

    ctx = context or current_context()
    s = vector(n_paths, dtype=np.float32, context=ctx)
    s.assign(s0)
    rnd = RandomNormal(np.float32)
    i = element_index(0, n_paths)
    drift = (mu - 0.5 * sigma * sigma) * dt
    vol = sigma * np.sqrt(dt)
    from ..expr.builtins import exp

    for step in range(n_steps):
        s *= exp(drift + vol * rnd(i, seed * 1000 + step))
    return Reductor(SUM)(s) / n_paths

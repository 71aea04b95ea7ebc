"""Multilevel B-spline approximation (MBA) of scattered data.

Analog of vexcl/mba.hpp:66-800 (`mba` :160-240, `mba_interp` :66-73).
Implements Lee, Wolberg & Shin's MBA: a hierarchy of cubic B-spline
control lattices fitted to residuals on the host (like the reference,
which builds the lattice host-side), evaluated on device as an expression
terminal — per level a 4^d-tap tensor-product spline gather, all levels
summed inside the fused kernel.

    interp = vex.mba(lo, hi, coords, values, grid=(16, 16))
    z[:] = interp(x, y)            # x, y: vectors/expressions of coords
"""

from __future__ import annotations

from itertools import product
from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..expr.node import ArrayTerminal, EmitEnv, Expr, as_expr

__all__ = ["mba"]


def _bspline_weights_np(t: np.ndarray) -> Tuple[np.ndarray, ...]:
    """Cubic uniform B-spline basis at fractional position t in [0,1)."""
    t2, t3 = t * t, t * t * t
    return (
        (1 - t) ** 3 / 6,
        (3 * t3 - 6 * t2 + 4) / 6,
        (-3 * t3 + 3 * t2 + 3 * t + 1) / 6,
        t3 / 6,
    )


def _point_setup_np(lo, hi, grid, coords):
    d = len(grid)
    h = [(hi[k] - lo[k]) / grid[k] for k in range(d)]
    u = [np.clip((coords[k] - lo[k]) / h[k], 0, grid[k] - 1e-12) for k in range(d)]
    i0 = [np.floor(u[k]).astype(np.int64) for k in range(d)]
    t = [u[k] - i0[k] for k in range(d)]
    w_axes = [_bspline_weights_np(t[k]) for k in range(d)]
    return i0, w_axes


def _fit_level(lo, hi, grid, coords, vals):
    """BA algorithm for one lattice level (mba.hpp control-lattice fit)."""
    d = len(grid)
    shape = tuple(g + 3 for g in grid)
    delta = np.zeros(shape)
    omega = np.zeros(shape)
    i0, w_axes = _point_setup_np(lo, hi, grid, coords)

    s2 = np.zeros(len(vals))
    for offs in product(range(4), repeat=d):
        w = np.ones(len(vals))
        for k in range(d):
            w = w * w_axes[k][offs[k]]
        s2 += w * w
    s2 = np.where(s2 > 0, s2, 1.0)

    for offs in product(range(4), repeat=d):
        w = np.ones(len(vals))
        for k in range(d):
            w = w * w_axes[k][offs[k]]
        phi = w * vals / s2
        idx = tuple(i0[k] + offs[k] for k in range(d))
        np.add.at(delta, idx, w * w * phi)
        np.add.at(omega, idx, w * w)

    return np.where(omega > 1e-20, delta / np.where(omega > 0, omega, 1), 0.0)


def _eval_level_host(lo, hi, grid, lattice, coords):
    d = len(grid)
    i0, w_axes = _point_setup_np(lo, hi, grid, coords)
    out = np.zeros(len(coords[0]))
    for offs in product(range(4), repeat=d):
        w = np.ones(len(coords[0]))
        for k in range(d):
            w = w * w_axes[k][offs[k]]
        out += w * lattice[tuple(i0[k] + offs[k] for k in range(d))]
    return out


class MBAExpr(Expr):
    _opname = "mba"

    def __init__(self, interp: "mba", coords: Sequence[Any]):
        self.interp = interp
        if len(coords) != interp.ndim:
            raise ValueError(f"mba expects {interp.ndim} coordinate expressions")
        lat_terms = tuple(ArrayTerminal(l) for l in interp._lattices_dev)
        self.children = lat_terms + tuple(as_expr(c) for c in coords)

    def extra_sig(self) -> str:
        ip = self.interp
        return f"{ip.ndim}:{ip.grids}"

    def emit(self, env: EmitEnv):
        ip = self.interp
        nlev = len(ip.grids)
        lattices = [self.children[i].emit_cached(env) for i in range(nlev)]
        coords = [c.emit_cached(env) for c in self.children[nlev:]]
        d = ip.ndim
        out = 0.0
        for grid, lattice in zip(ip.grids, lattices):
            h = [(ip.hi[k] - ip.lo[k]) / grid[k] for k in range(d)]
            u = [
                jnp.clip((coords[k] - ip.lo[k]) / h[k], 0, grid[k] - 1e-12)
                for k in range(d)
            ]
            i0 = [jnp.floor(u[k]).astype(jnp.int32) for k in range(d)]
            t = [u[k] - i0[k].astype(u[k].dtype) for k in range(d)]

            w_axes = []
            for k in range(d):
                tk = t[k]
                t2, t3 = tk * tk, tk * tk * tk
                w_axes.append(
                    (
                        (1 - tk) ** 3 / 6,
                        (3 * t3 - 6 * t2 + 4) / 6,
                        (-3 * t3 + 3 * t2 + 3 * tk + 1) / 6,
                        t3 / 6,
                    )
                )
            shape = tuple(g + 3 for g in grid)
            strides = np.concatenate([np.cumprod(shape[::-1])[::-1][1:], [1]]).astype(int)
            flat = lattice.reshape(-1)
            for offs in product(range(4), repeat=d):
                w = 1.0
                lin = 0
                for k in range(d):
                    w = w * w_axes[k][offs[k]]
                    lin = lin + (i0[k] + offs[k]) * int(strides[k])
                out = out + w * jnp.take(flat, lin, axis=0)
        return out

    def size_hint(self) -> Optional[int]:
        for c in self.children[len(self.interp.grids):]:
            n = c.size_hint()
            if n is not None:
                return n
        return None


class mba:
    """vex::mba<NDIM> (mba.hpp:160-240).

    Parameters mirror the reference ctor: domain ``lo``/``hi``, scattered
    ``coords`` (d arrays) and ``values``, initial ``grid`` density, number
    of refinement ``levels`` and a residual ``tol``.
    """

    def __init__(
        self,
        lo: Sequence[float],
        hi: Sequence[float],
        coords: Sequence[np.ndarray],
        values: np.ndarray,
        grid: Sequence[int] = (8,),
        levels: int = 8,
        tol: float = 1e-8,
        *,
        context=None,
    ):
        lo = tuple(float(v) for v in np.atleast_1d(lo))
        hi = tuple(float(v) for v in np.atleast_1d(hi))
        self.lo, self.hi = lo, hi
        self.ndim = len(lo)
        coords = [np.asarray(c, dtype=np.float64) for c in coords]
        vals = np.asarray(values, dtype=np.float64).copy()
        grid = tuple(int(g) for g in np.atleast_1d(grid))
        if len(grid) == 1 and self.ndim > 1:
            grid = grid * self.ndim

        self.grids: List[Tuple[int, ...]] = []
        lattices: List[np.ndarray] = []
        cur = grid
        resid = vals
        for _ in range(levels):
            lvl = _fit_level(lo, hi, cur, coords, resid)
            self.grids.append(cur)
            lattices.append(lvl)
            resid = resid - _eval_level_host(lo, hi, cur, lvl, coords)
            if np.abs(resid).max(initial=0.0) < tol:
                break
            cur = tuple(2 * g for g in cur)

        self.grids = [tuple(g) for g in self.grids]
        self._lattices_dev = [jnp.asarray(l) for l in lattices]
        self.residual = float(np.abs(resid).max(initial=0.0))
        # lattice tables commit once per device set on first sharded use
        from ..expr.compile import mark_replicable

        for lat in self._lattices_dev:
            mark_replicable(lat)

    def __call__(self, *coords: Any) -> MBAExpr:
        return MBAExpr(self, coords)

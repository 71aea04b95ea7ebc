"""Multilevel B-spline approximation (MBA) of scattered data.

Analog of vexcl/mba.hpp:66-800 (`mba` :160-240, `mba_interp` :66-73,
`append_refined` :417-444).  Implements Lee, Wolberg & Shin's MBA: a
hierarchy of cubic B-spline control lattices fitted to residuals on the
host (like the reference, which builds the lattice host-side), each
coarser lattice refined EXACTLY onto the next dyadic grid and added in —
so the device holds ONE flattened control lattice and evaluation is a
single 4^d-tap tensor-product spline gather inside the fused kernel
(the r3 multi-lattice sum paid levels x the gather traffic for the
identical result: 1.4 vs ~8 Mpts/s at 6 levels on v5e).

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
    # same explicit clamp as _spline_setup (f64 hits the `grid - 1e-12 ==
    # grid` rounding at grid ~9e3; deep refinement hierarchies get there)
    i0 = [
        np.minimum(np.floor(u[k]).astype(np.int64), grid[k] - 1)
        for k in range(d)
    ]
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


#: cubic B-spline dyadic subdivision mask (1/8)[1,4,6,4,1] — a cubic
#: basis at knot spacing h decomposes EXACTLY into these five bases at
#: h/2 (the reference's append_refined stencil, mba.hpp:417-444)
_SUBDIV = (0.125, 0.5, 0.75, 0.5, 0.125)


def _refine_axis(a: np.ndarray, ax: int, g: int) -> np.ndarray:
    """Refine one lattice axis from g cells (g+3 controls) to 2g cells:
    coarse control i contributes _SUBDIV[d] to fine control 2i + d - 3."""
    a = np.moveaxis(a, ax, 0)
    out = np.zeros((2 * g + 3,) + a.shape[1:], dtype=a.dtype)
    for d, s in enumerate(_SUBDIV):
        i_min = max(0, (4 - d) // 2)
        i_max = min(g + 2, (2 * g + 5 - d) // 2)
        j0 = 2 * i_min + d - 3
        cnt = i_max - i_min + 1
        out[j0 : j0 + 2 * cnt : 2] += s * a[i_min : i_max + 1]
    return np.moveaxis(out, 0, ax)


def _refine_np(lat: np.ndarray, grid: Sequence[int]) -> np.ndarray:
    """Exact dyadic refinement: re-express a control lattice on grid g as
    an identical spline on grid 2g (tensor product of _refine_axis)."""
    for ax, g in enumerate(grid):
        lat = _refine_axis(lat, ax, g)
    return lat


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


def _spline_setup(lo, hi, grid, coords):
    """Traced clamp/floor/weights shared by both eval forms."""
    d = len(lo)
    h = [(hi[k] - lo[k]) / grid[k] for k in range(d)]
    u = [
        jnp.clip((coords[k] - lo[k]) / h[k], 0, grid[k] - 1e-12)
        for k in range(d)
    ]
    # Explicit index clamp (ADVICE r3): in f32, `grid - 1e-12` rounds to
    # `grid` for grid >= 9, so floor(u) could reach grid and tap boxes
    # would cross into the next lattice row.  Clamping i0 (and deriving t
    # from the clamped index, so t -> 1 at the top edge, where the cubic
    # weights still evaluate the correct boundary value) makes the
    # in-bounds invariant hold regardless of float width.
    i0 = [
        jnp.minimum(jnp.floor(u[k]).astype(jnp.int32), grid[k] - 1)
        for k in range(d)
    ]
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
    return i0, w_axes


def _lattice_strides(grid):
    shape = tuple(g + 3 for g in grid)
    return np.concatenate(
        [np.cumprod(shape[::-1])[::-1][1:], [1]]).astype(int)


def mba_device_eval(lo, hi, grids, lattices, coords, patch=None):
    """Pure traced evaluation of a fitted multilevel B-spline
    (mba.hpp device codegen :240-800, factored out of MBAExpr.emit so
    benchmarks/user jits can call it functionally).

    With ``patch`` (the (n_controls, 4^d) widened table the flattened
    single-level fit precomputes): ONE row gather fetches all 4^d taps
    of a query point, then the cubic weights contract the row.  TPU
    gathers are INDEX-bound, not byte-bound — one 16-wide row gather
    measured 369 Mpts/s on v5e where 16 scalar gathers measured 7.3
    (exp/ probe, r3); the reference's per-tap reads are the natural GPU
    shape but the wrong TPU shape."""
    d = len(lo)
    if patch is not None:
        (grid,) = grids
        i0, w_axes = _spline_setup(lo, hi, grid, coords)
        strides = _lattice_strides(grid)
        base = 0
        for k in range(d):
            base = base + i0[k] * int(strides[k])
        nq = base.shape[0]
        # ONE gather, then a SEPARABLE weight contraction over the
        # (nq, 4, ..., 4) tap box — slicing the 4^d columns out one by
        # one defeats XLA's reduce fusion on the minor axis and measured
        # 68 vs 287 Mpts/s for this form at 16M (r3 probe)
        rows = jnp.take(patch, base, axis=0).reshape((nq,) + (4,) * d)
        out = rows
        for k in range(d - 1, -1, -1):
            wk = jnp.stack(w_axes[k], axis=1)            # (nq, 4)
            wk = wk.reshape((nq,) + (1,) * k + (4,))
            out = jnp.sum(out * wk, axis=k + 1)
        return out
    out = 0.0
    for grid, lattice in zip(grids, lattices):
        i0, w_axes = _spline_setup(lo, hi, grid, coords)
        strides = _lattice_strides(grid)
        flat = lattice.reshape(-1)
        for offs in product(range(4), repeat=d):
            w = 1.0
            lin = 0
            for k in range(d):
                w = w * w_axes[k][offs[k]]
                lin = lin + (i0[k] + offs[k]) * int(strides[k])
            out = out + w * jnp.take(flat, lin, axis=0)
    return out


class MBAExpr(Expr):
    _opname = "mba"

    def __init__(self, interp: "mba", coords: Sequence[Any]):
        self.interp = interp
        if len(coords) != interp.ndim:
            raise ValueError(f"mba expects {interp.ndim} coordinate expressions")
        if interp._patch_dev is not None:
            tabs = (ArrayTerminal(interp._patch_dev),)
        else:
            tabs = tuple(ArrayTerminal(l) for l in interp._lattices_dev)
        self._ntabs = len(tabs)
        self.children = tabs + tuple(as_expr(c) for c in coords)

    def extra_sig(self) -> str:
        # lo/hi are baked into the traced evaluator (domain mapping), so
        # they must key the kernel cache: two interpolants sharing
        # ndim/grids but fitted over different domains previously reused
        # one closure and returned wrong values (code-review r3 finding)
        ip = self.interp
        p = ":p" if ip._patch_dev is not None else ""
        return f"{ip.ndim}:{ip.grids}:{ip.lo}:{ip.hi}{p}"

    def emit(self, env: EmitEnv):
        ip = self.interp
        tabs = [self.children[i].emit_cached(env) for i in range(self._ntabs)]
        coords = [c.emit_cached(env) for c in self.children[self._ntabs:]]
        if ip._patch_dev is not None:
            return mba_device_eval(ip.lo, ip.hi, ip.grids, None, coords,
                                   patch=tabs[0])
        return mba_device_eval(ip.lo, ip.hi, ip.grids, tabs, coords)

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
        if int(levels) < 1:
            raise ValueError("mba needs levels >= 1")

        # Fit the residual hierarchy, FLATTENING as we go: each coarser
        # lattice refines exactly onto the next (dyadic) grid and is
        # added in (append_refined, mba.hpp:271,417-444), so the device
        # holds ONE control lattice and evaluation is a single 4^d-tap
        # pass — the multi-lattice sum costs levels x the gather traffic
        # for the identical result (measured 6 levels: 1.4 -> ~8 Mpts/s
        # on v5e).
        self.fit_grids: List[Tuple[int, ...]] = []
        cur = grid
        resid = vals
        psi = None
        prev = grid
        for _ in range(levels):
            lvl = _fit_level(lo, hi, cur, coords, resid)
            self.fit_grids.append(tuple(cur))
            resid = resid - _eval_level_host(lo, hi, cur, lvl, coords)
            psi = lvl if psi is None else _refine_np(psi, prev) + lvl
            prev = cur
            if np.abs(resid).max(initial=0.0) < tol:
                break
            cur = tuple(2 * g for g in cur)

        self.grids = [tuple(prev)]
        self._lattices_dev = [jnp.asarray(psi)]
        self.residual = float(np.abs(resid).max(initial=0.0))

        # Widened patch table: row j holds the 4^d control values of the
        # tap box whose base is control j, so device evaluation is ONE
        # row gather per query point instead of 4^d scalar gathers (TPU
        # gathers are index-bound: 369 vs 7.3 Mpts/s measured on v5e).
        # Costs 4^d x the lattice memory — gated by a budget since 3-D
        # lattices multiply by 64 (VEXTPU_MBA_PATCH_MB, default 64).
        import os

        self._patch_dev = None
        taps = 4 ** self.ndim
        flat = psi.reshape(-1)
        budget = int(os.environ.get("VEXTPU_MBA_PATCH_MB", "64"))
        if flat.size * taps * flat.itemsize <= budget * (1 << 20):
            strides = _lattice_strides(self.grids[0])
            patch = np.empty((flat.size, taps), dtype=flat.dtype)
            base = np.arange(flat.size)
            for t_i, offs in enumerate(product(range(4), repeat=self.ndim)):
                off = sum(int(offs[k]) * int(strides[k])
                          for k in range(self.ndim))
                # rows whose tap box would run past the end are never
                # used as a base (i0[k] <= grid-1); clip keeps the
                # build in-bounds for them
                patch[:, t_i] = flat[np.minimum(base + off, flat.size - 1)]
            self._patch_dev = jnp.asarray(patch)

        # lattice tables commit once per device set on first sharded use
        from ..expr.compile import mark_replicable

        for lat in self._lattices_dev:
            mark_replicable(lat)
        if self._patch_dev is not None:
            mark_replicable(self._patch_dev)

    def __call__(self, *coords: Any) -> MBAExpr:
        return MBAExpr(self, coords)

"""DIA (diagonal) sparse format — the TPU-first layout for banded matrices.

The reference's hybrid ELL (vexcl/spmat/hybrid_ell.inl) is the right GPU
format; on TPU its `x[col]` gather is the bottleneck (random access defeats
the VPU's vector loads).  Matrices from regular grids — including the
reference's own 7-point Poisson benchmark (examples/benchmark.cpp:353-478)
— are a small set of dense diagonals, and a diagonal SpMV is pure
shifted reads + multiply-adds: contiguous, fusable, HBM-bandwidth-bound
instead of gather-bound.  `SpMat(..., fmt=None)` auto-detects
diagonal-dominated structure and picks DIA (the TPU analog of the
reference's ELL-width occupancy heuristic, sparse/ell.hpp:92-121).

Layout: ``offsets`` (d,) int32; ``vals`` (d, n) — vals[k, i] is A[i, i +
offsets[k]] (zero where out of range).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DIA", "try_build_dia"]


class DIA:
    format = "dia"

    def __init__(self, n: int, m: int, offsets: np.ndarray, vals: np.ndarray):
        self.n = int(n)
        self.m = int(m)
        self.offsets = tuple(int(o) for o in offsets)  # static: baked in sig
        # bf16-exact compression: finite-difference matrices usually hold
        # small integer-ish values that bf16 represents EXACTLY; storing
        # them as bf16 halves the dominant HBM stream of the SpMV (the d
        # value planes) with bit-identical results (compute stays f32)
        if vals.dtype == np.float32 and np.array_equal(
            vals, np.asarray(vals, dtype=jnp.bfloat16).astype(np.float32)
        ):
            self.vals = jnp.asarray(vals, dtype=jnp.bfloat16)
        else:
            from ..utils.util import to_device

            self.vals = to_device(vals)
        self.nnz = int(np.count_nonzero(vals))

    @property
    def dtype(self):
        return self.vals.dtype

    def leaves(self) -> Tuple:
        return (self.vals,)

    @staticmethod
    def matvec(n: int, m: int, offsets, leaves, x):
        """y[i] = sum_k vals[k, i] * x[i + off_k].

        Formulated as full-length shifted-window products over a
        zero-padded x: no scatter, no masks (vals are already zero at
        out-of-range rows by construction), so XLA fuses the whole SpMV
        into one bandwidth-bound pass."""
        (vals,) = leaves
        if not offsets:
            return jnp.zeros(n, dtype=jnp.result_type(vals, x))
        from .pallas_dia import (
            dia_matvec_pallas,
            dia_matvec_pallas_ring,
            dia_matvec_pallas_roll,
            use_pallas_dia,
            use_pallas_dia_ring,
            use_pallas_dia_roll,
        )

        from ..ops.dispatch import array_on_multiple_devices

        ok_dt = (x.dtype == vals.dtype or (
            x.dtype == jnp.float32 and vals.dtype == jnp.bfloat16
        )) and not (array_on_multiple_devices(x)
                    or array_on_multiple_devices(vals))
        if use_pallas_dia_ring(n, m, offsets, vals) and ok_dt:
            return dia_matvec_pallas_ring(n, m, offsets, vals, x)
        if use_pallas_dia_roll(n, m, offsets, vals) and ok_dt:
            return dia_matvec_pallas_roll(n, m, offsets, vals, x)
        if use_pallas_dia(offsets, vals) and ok_dt:
            return dia_matvec_pallas(n, m, offsets, vals, x)
        lpad = max(0, -min(offsets))
        rpad = max(0, n + max(offsets) - m)
        xp = jnp.pad(x, (lpad, rpad))
        vf = vals.astype(x.dtype) if vals.dtype == jnp.bfloat16 else vals
        y = None
        for k, off in enumerate(offsets):
            seg = vf[k] * jax.lax.dynamic_slice_in_dim(xp, lpad + off, n)
            y = seg if y is None else y + seg
        return y

    def apply_leaves(self, leaves, x):
        return DIA.matvec(self.n, self.m, self.offsets, leaves, x)

    def apply(self, x):
        return DIA.matvec(self.n, self.m, self.offsets, self.leaves(), x)


def try_build_dia(
    n: int,
    m: int,
    ptr: np.ndarray,
    col: np.ndarray,
    val: np.ndarray,
    max_diags: int = 32,
    min_fill: float = 0.25,
) -> Optional[DIA]:
    """Build DIA if the matrix is diagonal-structured: at most ``max_diags``
    distinct diagonals, each at least ``min_fill`` occupied on average.
    Returns None when the structure doesn't fit (caller falls back to
    ELL/CSR)."""
    ptr = np.asarray(ptr, dtype=np.int64)
    col = np.asarray(col)
    val = np.asarray(val)
    nnz = int(ptr[-1])
    if nnz == 0:
        return None
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(ptr))
    offs = col.astype(np.int64) - rows
    # presence-table unique: O(nnz), no 10^8-entry sort.  Offsets span
    # [-(n-1), m-1], so bias by n to index the (n+m+1)-entry table.
    base = np.int64(n)
    present = np.zeros(n + m + 1, dtype=bool)
    present[offs + base] = True
    uniq = np.flatnonzero(present) - base
    if len(uniq) > max_diags:
        return None
    if nnz < min_fill * len(uniq) * n:
        return None
    lookup = np.cumsum(present) - 1
    k_idx = lookup[offs + base]
    pos = k_idx * np.int64(n) + rows
    size = len(uniq) * n
    # CSR rows are typically duplicate-free: one (diagonal, row) cell per
    # entry.  Then a direct fancy assignment fills the planes at memcpy
    # speed.  (np.bincount-with-weights measured 28 s for 15M nnz —
    # ~0.5 Melem/s — and np.add.at is worse.)  Duplicates (same cell twice,
    # summing semantics) take the native scatter-add helper.
    seen = np.zeros(size, dtype=bool)
    seen[pos] = True
    has_dups = int(seen.sum()) < len(pos)
    flat = np.zeros(size, dtype=val.dtype)
    if not has_dups:
        flat[pos] = val
    else:
        from ..utils.native import scatter_add

        scatter_add(flat, pos, val)
    vals = flat.reshape(len(uniq), n)
    return DIA(n, m, uniq, vals)

"""Vectorized 7-point Poisson CSR builder (the reference benchmark's
canonical SpMV workload, examples/benchmark.cpp:353-478)."""

from __future__ import annotations

import numpy as np

__all__ = ["poisson_7pt"]


def poisson_7pt(n: int, dtype=np.float64):
    """CSR arrays (ptr, col, val) of the n^3 7-point Poisson matrix."""
    idx = np.arange(n ** 3).reshape(n, n, n)
    rows, cols, vals = [], [], []

    def add(mask, neighbor, v):
        rows.append(idx[mask].ravel())
        cols.append(neighbor.ravel())
        vals.append(np.full(neighbor.size, v, dtype=dtype))

    full = np.ones((n, n, n), bool)
    add(full, idx, 6.0)
    m = np.zeros((n, n, n), bool); m[1:] = True
    add(m, idx[:-1], -1.0)
    m = np.zeros((n, n, n), bool); m[:-1] = True
    add(m, idx[1:], -1.0)
    m = np.zeros((n, n, n), bool); m[:, 1:] = True
    add(m, idx[:, :-1], -1.0)
    m = np.zeros((n, n, n), bool); m[:, :-1] = True
    add(m, idx[:, 1:], -1.0)
    m = np.zeros((n, n, n), bool); m[:, :, 1:] = True
    add(m, idx[:, :, :-1], -1.0)
    m = np.zeros((n, n, n), bool); m[:, :, :-1] = True
    add(m, idx[:, :, 1:], -1.0)

    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    ptr = np.zeros(n ** 3 + 1, dtype=np.int64)
    np.add.at(ptr, rows + 1, 1)
    ptr = np.cumsum(ptr)
    return ptr, cols.astype(np.int32), vals

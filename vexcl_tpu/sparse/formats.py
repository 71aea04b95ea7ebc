"""Device sparse formats: CSR, ELL, hybrid ELL+CSR-tail.

Analog of vexcl/sparse/{csr,ell,matrix}.hpp and the first-gen kernels
vexcl/spmat/hybrid_ell.inl / csr.inl.

TPU-native layout choices:

* **ELL** — the natural TPU format: rectangular (rows, width) value/column
  planes, so the gather `x[cols]` and the width-axis reduction are dense,
  statically-shaped ops XLA vectorizes on the VPU.  Padding uses column -1
  (masked), matching the reference's convention (sparse/ell.hpp).
* **CSR** — kept for parity and for very skewed row lengths: matvec is
  `vals * x[col]` + `segment_sum` over precomputed row ids (num_segments is
  static, so XLA compiles a fixed-shape scatter-add).
* **Hybrid** — ELL part of width chosen by the reference's occupancy
  heuristic (3:1 rule, sparse/ell.hpp:92-121) + CSR tail for the long rows.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.util import to_device

__all__ = ["CSR", "ELL", "Hybrid", "from_csr_host", "choose_ell_width"]


class CSR:
    """Compressed sparse row (sparse/csr.hpp)."""

    format = "csr"

    def __init__(self, n: int, m: int, ptr, col, val):
        self.n = int(n)
        self.m = int(m)
        ptr = np.asarray(ptr)
        self.nnz = int(ptr[-1])
        # static row-id expansion for segment_sum
        row_ids = np.repeat(np.arange(self.n, dtype=np.int32), np.diff(ptr))
        self.row_ids = jnp.asarray(row_ids)
        self.col = jnp.asarray(np.asarray(col), dtype=jnp.int32)
        self.val = to_device(np.asarray(val))
        self.ptr = jnp.asarray(ptr, dtype=jnp.int32)

    @property
    def dtype(self):
        return self.val.dtype

    def leaves(self) -> Tuple:
        return (self.row_ids, self.col, self.val)

    @staticmethod
    def matvec(n: int, leaves, x):
        row_ids, col, val = leaves
        prod = val * jnp.take(x, col, axis=0)
        return jax.ops.segment_sum(prod, row_ids, num_segments=n)

    def apply_leaves(self, leaves, x):
        """Matvec with arrays passed in (for jit-argument plumbing; only
        static config is read from self)."""
        return CSR.matvec(self.n, leaves, x)

    def apply(self, x):
        return CSR.matvec(self.n, self.leaves(), x)


class ELL:
    """Padded ELLPACK (sparse/ell.hpp)."""

    format = "ell"

    def __init__(self, n: int, m: int, ell_col, ell_val):
        self.n = int(n)
        self.m = int(m)
        self.width = int(ell_col.shape[1]) if ell_col.ndim == 2 else 0
        self.col = jnp.asarray(np.asarray(ell_col), dtype=jnp.int32)
        self.val = to_device(np.asarray(ell_val))
        self.nnz = int(np.count_nonzero(np.asarray(ell_col) >= 0))

    @property
    def dtype(self):
        return self.val.dtype

    def leaves(self) -> Tuple:
        return (self.col, self.val)

    @staticmethod
    def matvec(n: int, leaves, x):
        col, val = leaves
        mask = col >= 0
        gathered = jnp.take(x, jnp.where(mask, col, 0), axis=0)
        prod = jnp.where(mask, val * gathered, 0)
        return jnp.sum(prod, axis=1)

    def apply_leaves(self, leaves, x):
        return ELL.matvec(self.n, leaves, x)

    def apply(self, x):
        return ELL.matvec(self.n, self.leaves(), x)


class Hybrid:
    """ELL + CSR tail (spmat/hybrid_ell.inl; width heuristic
    sparse/ell.hpp:92-121)."""

    format = "hyb"

    def __init__(self, ell: ELL, tail: Optional[CSR]):
        self.ell = ell
        self.tail = tail
        self.n = ell.n
        self.m = ell.m
        self.nnz = ell.nnz + (tail.nnz if tail else 0)

    @property
    def dtype(self):
        return self.ell.val.dtype

    def leaves(self) -> Tuple:
        t = self.tail.leaves() if self.tail else ()
        return self.ell.leaves() + t

    @staticmethod
    def matvec(n: int, leaves, x, has_tail: bool):
        y = ELL.matvec(n, leaves[:2], x)
        if has_tail:
            y = y + CSR.matvec(n, leaves[2:], x)
        return y

    def apply_leaves(self, leaves, x):
        return Hybrid.matvec(self.n, leaves, x, self.tail is not None)

    def apply(self, x):
        return Hybrid.matvec(self.n, self.leaves(), x, self.tail is not None)


def choose_ell_width(row_len: np.ndarray) -> int:
    """Reference heuristic (sparse/ell.hpp:92-121): grow the ELL width
    while each added column stays 'worth it' (>= 1/3 of rows still have an
    entry in that column)."""
    if len(row_len) == 0:
        return 0
    max_w = int(row_len.max(initial=0))
    hist = np.bincount(row_len, minlength=max_w + 1)
    rows_with = len(row_len) - np.cumsum(hist)  # rows with len > w
    w = 0
    while w < max_w and rows_with[w] >= max(1, len(row_len) // 3):
        w += 1
    return w


def from_csr_host(
    n: int,
    m: int,
    ptr: np.ndarray,
    col: np.ndarray,
    val: np.ndarray,
    fmt: str = "hyb",
):
    """Build a device format from host CSR arrays.

    The CSR->ELL/hybrid repack runs in the C++ helper when available
    (native/repack.cpp), mirroring the reference's native conversion layer;
    falls back to numpy.
    """
    ptr = np.asarray(ptr, dtype=np.int64)
    col = np.asarray(col)
    val = np.asarray(val)
    row_len = np.diff(ptr).astype(np.int64)

    if fmt == "csr":
        return CSR(n, m, ptr, col, val)

    if fmt == "ell":
        width = int(row_len.max(initial=0))
        ecol, eval_ = _repack_ell(n, ptr, col, val, width)
        return ELL(n, m, ecol, eval_)

    if fmt == "sellr":
        from .shuffle import SELLR

        return SELLR(n, m, ptr, col, val)

    if fmt == "hyb":
        width = choose_ell_width(row_len)
        ecol, eval_ = _repack_ell(n, ptr, col, val, width)
        ell = ELL(n, m, ecol, eval_)
        # CSR tail with the overflow entries
        tail_len = np.maximum(row_len - width, 0)
        if tail_len.sum() == 0:
            return Hybrid(ell, None)
        tptr = np.concatenate([[0], np.cumsum(tail_len)])
        tcol = np.empty(int(tail_len.sum()), dtype=col.dtype)
        tval = np.empty(int(tail_len.sum()), dtype=val.dtype)
        for i in np.nonzero(tail_len)[0]:
            s, e = ptr[i] + width, ptr[i + 1]
            ts, te = tptr[i], tptr[i + 1]
            tcol[ts:te] = col[s:e]
            tval[ts:te] = val[s:e]
        return Hybrid(ell, CSR(n, m, tptr, tcol, tval))

    raise ValueError(f"unknown sparse format {fmt!r}")


def _repack_ell(n, ptr, col, val, width):
    """CSR -> padded ELL planes (native-accelerated when built)."""
    try:
        from ..utils.native import csr_to_ell

        return csr_to_ell(n, ptr, col, val, width)
    except Exception:
        pass
    ecol = np.full((n, width), -1, dtype=np.int32)
    eval_ = np.zeros((n, width), dtype=val.dtype)
    row_len = np.minimum(np.diff(ptr), width).astype(np.int64)
    for i in range(n):
        k = row_len[i]
        if k:
            ecol[i, :k] = col[ptr[i] : ptr[i] + k]
            eval_[i, :k] = val[ptr[i] : ptr[i] + k]
    return ecol, eval_

"""vex::multi_array analog — N-D container over a flat vector + slicer.

Reference: vexcl/multi_array.hpp (multi_array :71-117, multi_array_view
:43-69, reduce over dims :124-144) and tests/multi_array.cpp.  The
reference builds it from exactly the pieces we already have: a flat
``vector`` plus a bound ``slicer`` view; index views are readable
expression terminals AND assignable (``m[idx].assign(expr)`` — the write
path the reference spells ``x(indices[i][_][_]).vec() = i``).

Deviation: the reference restricts multi-arrays to single-device contexts
(multi_array.hpp:84-87); here the flat storage shards like any vector —
views stay legal because gslice views work on sharded vectors.

    m = vex.multi_array(vex.extents[32][32][32], dtype="double")
    m.vec()[:] = vex.element_index() * 0.1
    m[vex.indices[5][vex._][vex._]].assign(2.0)
    row_sums = vex.eval(vex.reduce_view("sum", m, 2))
"""

from __future__ import annotations

import numpy as np

from .expr.view import MultiSliceView, slicer
from .vector import vector

__all__ = ["extents", "indices", "multi_array"]


class _ChainGen:
    """``extents[32][32]`` / ``indices[5][_]`` chained-subscript builders
    (the boost::extents / boost::indices generators the reference re-uses,
    multi_array.hpp + vector_view.hpp:446-509)."""

    def __init__(self, key=()):
        self.key = key

    def __getitem__(self, k):
        ks = k if isinstance(k, tuple) else (k,)
        return type(self)(self.key + ks)

    def __iter__(self):
        return iter(self.key)

    def __len__(self):
        return len(self.key)


class _ExtentsGen(_ChainGen):
    def __getitem__(self, k):
        ks = k if isinstance(k, tuple) else (k,)
        return _ExtentsGen(self.key + tuple(int(d) for d in ks))


extents = _ExtentsGen()
indices = _ChainGen()


class multi_array:
    """N-dimensional device array = flat sharded vector + slicer."""

    def __init__(self, ext, dtype=None, context=None, data=None):
        if data is not None:
            data = np.asarray(data)
            if ext is None:
                ext = data.shape
        if dtype is None:
            # infer from host data like vector(); f64 default otherwise
            # (the reference's multi_array tests are double)
            dtype = data.dtype if data is not None else np.float64
        dims = tuple(int(d) for d in (ext.key if isinstance(ext, _ChainGen)
                                      else ext))
        if not dims:
            raise ValueError("multi_array needs at least one extent")
        n = int(np.prod(dims))
        self.dims = dims
        if data is not None:
            if data.size != n:
                raise ValueError(
                    f"data size {data.size} != extents {dims}")
            self._vec = vector(data=data.reshape(-1), dtype=dtype,
                               context=context)
        else:
            self._vec = vector(n, dtype=dtype, context=context)
        self.slice = slicer(dims)

    # -- reference surface (multi_array.hpp:90-96, :110-116) ------------
    def vec(self) -> vector:
        return self._vec

    @property
    def shape(self):
        return self.dims

    @property
    def ndim(self):
        return len(self.dims)

    @property
    def dtype(self):
        return self._vec.dtype

    def size(self, d=None) -> int:
        if d is None:
            return self._vec.size
        return self.dims[int(d)]

    def view(self, key=None) -> MultiSliceView:
        """Index view (multi_array_view, :43-69): readable in expressions,
        assignable via ``.assign``."""
        if key is None:
            key = (slice(None),) * len(self.dims)
        elif isinstance(key, _ChainGen):
            key = key.key
        return self.slice[key](self._vec)

    def __call__(self, key):
        return self.view(key)

    def __getitem__(self, key):
        return self.view(key)

    def __setitem__(self, key, value):
        self.view(key).assign(value)

    def __array__(self, dtype=None):
        a = np.asarray(self._vec).reshape(self.dims)
        return a.astype(dtype) if dtype is not None else a

    def __repr__(self):
        return f"multi_array{self.dims}<{np.dtype(self.dtype).name}>"

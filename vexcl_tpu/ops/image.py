"""Image/texture terminals and SVM-style mapped vectors.

Analogs of vexcl/image.hpp + backend/cuda/texture_object.hpp (#42) and
vexcl/svm_vector.hpp (#41).

* ``image2d`` — a 2-D read-only sampled array terminal: nearest or bilinear
  sampling at (x, y) coordinate expressions, with clamp-to-edge addressing.
  The reference binds OpenCL images / CUDA texture objects; the TPU analog
  is a gather with address-mode arithmetic fused into the kernel (TPUs have
  no texture units — bilinear filtering is 4 gathers + a lerp on the VPU).
* ``svm_vector`` — shared-virtual-memory analog.  TPU has no host-visible
  device memory; ``map()`` gives a host mirror and ``unmap()`` writes it
  back, preserving the reference's map/unmap protocol
  (svm_vector.hpp:38-221).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from ..expr.node import ArrayTerminal, EmitEnv, Expr, as_expr
from ..vector import vector

__all__ = ["image2d", "svm_vector"]


class Image2DSample(Expr):
    _size_transparent = False
    _opname = "img2d"

    def __init__(self, img: "image2d", x: Any, y: Any):
        self.img = img
        self.children = (ArrayTerminal(img.data), as_expr(x), as_expr(y))

    def extra_sig(self) -> str:
        return f"{self.img.filter}:{self.img.shape}"

    def emit(self, env: EmitEnv):
        data = self.children[0].emit_cached(env)
        x = self.children[1].emit_cached(env)
        y = self.children[2].emit_cached(env)
        h, w = self.img.shape

        def clamp_gather(iy, ix):
            iy = jnp.clip(iy, 0, h - 1)
            ix = jnp.clip(ix, 0, w - 1)
            return data[iy, ix]

        if self.img.filter == "nearest":
            return clamp_gather(
                jnp.round(y).astype(jnp.int32), jnp.round(x).astype(jnp.int32)
            )
        # bilinear
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = (x - x0).astype(data.dtype)
        ty = (y - y0).astype(data.dtype)
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        v00 = clamp_gather(iy0, ix0)
        v01 = clamp_gather(iy0, ix0 + 1)
        v10 = clamp_gather(iy0 + 1, ix0)
        v11 = clamp_gather(iy0 + 1, ix0 + 1)
        return (
            v00 * (1 - tx) * (1 - ty)
            + v01 * tx * (1 - ty)
            + v10 * (1 - tx) * ty
            + v11 * tx * ty
        )

    def size_hint(self) -> Optional[int]:
        for c in self.children[1:]:
            n = c.size_hint()
            if n is not None:
                return n
        return None


class image2d:
    """2-D sampled image terminal: ``img(x_expr, y_expr)`` inside
    expressions (image.hpp analog)."""

    def __init__(self, data: np.ndarray, filter: str = "nearest", *, context=None):
        host = np.asarray(data)
        if host.ndim != 2:
            raise ValueError("image2d expects a 2-D array")
        if filter not in ("nearest", "linear"):
            raise ValueError("filter must be 'nearest' or 'linear'")
        self.data = jnp.asarray(host)
        self.shape = host.shape
        self.filter = filter
        # commit once per device set on first use in a sharded expression
        # (instead of XLA re-broadcasting the table every call)
        from ..expr.compile import mark_replicable

        mark_replicable(self.data)

    def __call__(self, x: Any, y: Any) -> Image2DSample:
        return Image2DSample(self, x, y)


class svm_vector(vector):
    """SVM-style vector with an explicit map/unmap host mirror
    (svm_vector.hpp:38-221)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._mapped: Optional[np.ndarray] = None

    def map(self, part: int = 0) -> np.ndarray:  # type: ignore[override]
        self._mapped = np.array(self.to_numpy())
        return self._mapped

    def unmap(self) -> None:
        if self._mapped is not None:
            self.write_data(self._mapped)
            self._mapped = None

    def __enter__(self) -> np.ndarray:
        return self.map()

    def __exit__(self, *exc) -> None:
        self.unmap()

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

__all__ = ["image1d", "image2d", "svm_vector"]


class Image2DSample(Expr):
    _size_transparent = False
    _opname = "img2d"

    def __init__(self, img: "image2d", x: Any, y: Any):
        self.img = img
        if img.filter == "linear":
            img._ensure_patch()
        self._patched = (img.filter == "linear"
                         and img._patch_dev is not None)
        tab = img._patch_dev if self._patched else img.data
        self.children = (ArrayTerminal(tab), as_expr(x), as_expr(y))

    def extra_sig(self) -> str:
        p = ":p" if self._patched else ""
        return f"{self.img.filter}:{self.img.shape}{p}"

    def emit(self, env: EmitEnv):
        tab = self.children[0].emit_cached(env)
        x = self.children[1].emit_cached(env)
        y = self.children[2].emit_cached(env)
        h, w = self.img.shape

        def clamp_gather(iy, ix):
            iy = jnp.clip(iy, 0, h - 1)
            ix = jnp.clip(ix, 0, w - 1)
            return tab[iy, ix]

        if self.img.filter == "nearest":
            return clamp_gather(
                jnp.round(y).astype(jnp.int32), jnp.round(x).astype(jnp.int32)
            )
        # bilinear.  Coordinates clamp to the domain FIRST — clamp-to-edge
        # yields the same value either way (out-of-range lerps collapse to
        # the edge texel) and it lets the patch fast path index safely.
        x = jnp.clip(x, 0, w - 1)
        y = jnp.clip(y, 0, h - 1)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = (x - x0).astype(tab.dtype)
        ty = (y - y0).astype(tab.dtype)
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        if self._patched:
            # ONE row gather fetches all 4 texels (TPU gathers are
            # index-bound — the MBA patch-table finding, ~50x the 4
            # scalar gathers; docs/tpu_kernel_notes.md), then the lerp
            # contracts separably (column slices defeat reduce fusion)
            rows = jnp.take(tab, iy0 * w + ix0, axis=0)
            nq = rows.shape[0]
            rows = rows.reshape(nq, 2, 2)            # (dy, dx)
            wx = jnp.stack([1 - tx, tx], axis=1)
            wy = jnp.stack([1 - ty, ty], axis=1)
            return jnp.sum(jnp.sum(rows * wx[:, None, :], axis=2) * wy,
                           axis=1)
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

        self._host = host
        self._patch_dev = None
        self._patch_built = False

        # commit once per device set on first use in a sharded expression
        # (instead of XLA re-broadcasting the table every call)
        from ..expr.compile import mark_replicable

        mark_replicable(self.data)

    def _ensure_patch(self) -> None:
        """Bilinear patch table, built lazily on the FIRST linear sample
        (ADVICE r3: eager construction paid 4x memory for images never
        sampled through the patched path): row (y*w + x) holds the 2x2
        texel neighborhood (edge-clamped), so sampling is ONE row gather
        instead of 4 scalar gathers (index-bound TPU gathers — the MBA
        finding, docs/tpu_kernel_notes.md).  4x the image memory,
        budget-gated like the MBA patch (VEXTPU_IMG_PATCH_MB), sized
        against the DEVICE dtype actually shipped (an f64 host image
        downcast to f32 on device counts 4-byte rows)."""
        if self._patch_built:
            return
        self._patch_built = True
        import os

        host = self._host
        budget = int(os.environ.get("VEXTPU_IMG_PATCH_MB", "64"))
        dev_itemsize = np.dtype(self.data.dtype).itemsize
        if host.size * 4 * dev_itemsize <= budget * (1 << 20):
            h, w = host.shape
            yc = np.minimum(np.arange(h) + 1, h - 1)
            xc = np.minimum(np.arange(w) + 1, w - 1)
            patch = np.stack(
                [host,
                 host[:, xc],
                 host[yc, :],
                 host[yc][:, xc]], axis=-1).reshape(h * w, 4)
            self._patch_dev = jnp.asarray(patch)
            from ..expr.compile import mark_replicable

            mark_replicable(self._patch_dev)

    def __call__(self, x: Any, y: Any) -> Image2DSample:
        return Image2DSample(self, x, y)


class Image1DSample(Expr):
    _size_transparent = False
    _opname = "img1d"

    def __init__(self, img: "image1d", x: Any):
        self.img = img
        self.children = (ArrayTerminal(img.data), as_expr(x))

    def extra_sig(self) -> str:
        return f"{self.img.filter}:{self.img.shape}"

    def emit(self, env: EmitEnv):
        tab = self.children[0].emit_cached(env)
        x = self.children[1].emit_cached(env)
        (w,) = self.img.shape
        if self.img.filter == "nearest":
            ix = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
            return jnp.take(tab, ix, axis=0)
        x = jnp.clip(x, 0, w - 1)
        x0 = jnp.floor(x)
        tx = (x - x0).astype(tab.dtype)
        ix0 = x0.astype(jnp.int32)
        v0 = jnp.take(tab, ix0, axis=0)
        v1 = jnp.take(tab, jnp.minimum(ix0 + 1, w - 1), axis=0)
        return v0 * (1 - tx) + v1 * tx

    def size_hint(self) -> Optional[int]:
        return self.children[1].size_hint()


class image1d:
    """1-D sampled image terminal (tests/image.cpp image1d: a texture
    fetched by index inside an expression; image.hpp / cuda
    texture_object.hpp analog).  ``img(x_expr)`` with clamp-to-edge
    nearest or linear filtering."""

    def __init__(self, data: np.ndarray, filter: str = "nearest", *,
                 context=None):
        host = np.asarray(data)
        if host.ndim != 1:
            raise ValueError("image1d expects a 1-D array")
        if filter not in ("nearest", "linear"):
            raise ValueError("filter must be 'nearest' or 'linear'")
        self.data = jnp.asarray(host)
        self.shape = host.shape
        self.filter = filter

        from ..expr.compile import mark_replicable

        mark_replicable(self.data)

    def __call__(self, x: Any) -> Image1DSample:
        return Image1DSample(self, x)


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

"""gather / scatter of arbitrary index sets.

Analog of vexcl/gather.hpp:46-170 (`index_partition`, `gather`, `scatter`):
the reference slices a sorted index list per device partition and does
per-device enqueueRead/Write.  On TPU a device-side take/scatter kernel does
the partition-aware movement (GSPMD handles sharded sources), and only the
host<->device hop the user actually asked for remains.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..vector import vector

__all__ = ["gather", "scatter", "Gather", "Scatter"]


class Gather:
    """Reusable gatherer for a fixed index set (vex::gather :90)."""

    def __init__(self, context, indices: Sequence[int]):
        self.indices = np.asarray(indices, dtype=np.int64)

    def __call__(self, src: vector, dst: Optional[np.ndarray] = None) -> np.ndarray:
        vals = np.asarray(jnp.take(src.array, jnp.asarray(self.indices), axis=0))
        if dst is not None:
            np.copyto(dst[: len(vals)], vals)
            return dst
        return vals

    get = __call__


class Scatter:
    """Reusable scatterer for a fixed index set (vex::scatter :127)."""

    def __init__(self, context, indices: Sequence[int]):
        self.indices = np.asarray(indices, dtype=np.int64)

    def __call__(self, values, dst: vector) -> None:
        vals = jnp.asarray(np.asarray(values))
        dst._set_array(dst.array.at[jnp.asarray(self.indices)].set(vals))

    put = __call__


def gather(src: vector, indices, dst: Optional[np.ndarray] = None) -> np.ndarray:
    return Gather(src.context, indices)(src, dst)


def scatter(values, indices, dst: vector) -> None:
    Scatter(dst.context, indices)(values, dst)

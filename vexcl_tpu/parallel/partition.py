"""Partitioning policy — the reference's "data parallelism" axis.

Analog of vexcl/vector.hpp:62-190 (`partitioning_scheme`, `set_partitioning`,
`partition`) and the bandwidth-probe weighting (`device_vector_perf`
:1237-1255, `device_spmv_perf` spmat.hpp:410-484).

TPU pods are homogeneous, so the default weight function is uniform and the
partition is even block sharding — exactly what ``NamedSharding(mesh,
P('devices'))`` implements in hardware.  A custom weight function feeds
`vector.partition()` and therefore every per-partition host view
(`vector.map(part)`, per-partition read/write) — the observable contract of
the reference's partition points.  Physical data placement is a documented
deviation: XLA's NamedSharding cannot express uneven shards, and on
homogeneous TPU chips weighted *placement* buys nothing (the reference
weights devices because one OpenCL context may mix a fast and a slow GPU),
so GSPMD tiles and the shard_map algorithms stay even regardless of
weights.  See docs/multidevice.md.
"""

from __future__ import annotations

import threading
from typing import Callable, List, Optional

import numpy as np

_lock = threading.Lock()
_weight_fn: Optional[Callable] = None
_weights_frozen = False


def set_partitioning(weight_fn: Callable) -> None:
    """Install a device weight function: ``weight_fn(device) -> float``.

    Like the reference (vector.hpp:90-112), the policy is global and may only
    be set before the first partition is computed.
    """
    global _weight_fn
    with _lock:
        if _weights_frozen:
            raise RuntimeError(
                "set_partitioning() must be called before any vector is "
                "partitioned (reference semantics, vector.hpp:95-104)"
            )
        _weight_fn = weight_fn


def reset_partitioning() -> None:
    global _weight_fn, _weights_frozen
    with _lock:
        _weight_fn = None
        _weights_frozen = False


def device_weights(devices) -> np.ndarray:
    global _weights_frozen
    with _lock:
        _weights_frozen = True
        fn = _weight_fn
    if fn is None:
        return np.ones(len(devices))
    return np.asarray([float(fn(d)) for d in devices])


def partition_points(n: int, ndev: int, weights: Optional[np.ndarray] = None) -> np.ndarray:
    """Partition points for n elements over ndev devices (part[] analog)."""
    if weights is None:
        weights = np.ones(ndev)
    cum = np.cumsum(weights) / np.sum(weights)
    pts = np.round(cum * n).astype(np.int64)
    out = np.concatenate([[0], pts])
    out[-1] = n
    return np.maximum.accumulate(out)


def shard_sizes(n: int, ndev: int) -> List[int]:
    pts = partition_points(n, ndev)
    return [int(pts[i + 1] - pts[i]) for i in range(ndev)]

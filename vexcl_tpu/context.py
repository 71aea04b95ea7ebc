"""Device selection, composable filters, and Context / mesh management.

TPU-native analog of vexcl/devlist.hpp (Context :273-391, StaticContext
:229-252, Filter::* :53-225) and the per-backend filters
(vexcl/backend/opencl/filter.hpp:62-330).

The reference enumerates OpenCL/CUDA devices, applies a composable boolean
filter, and creates one context+queue per device; containers are then
partitioned across those queues.  Here the devices come from
``jax.devices()``, the filter algebra is preserved (``&``, ``|``, ``~``
instead of C++ ``&&, ||, !``), and the selected devices become a
``jax.sharding.Mesh`` — the partition axis of every container.  Multi-axis
meshes (for 2D sharding of matrices) are supported beyond the reference.
"""

from __future__ import annotations

import os
import re
from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .config import config, init_compilation_cache

__all__ = ["Filter", "Context", "current_context", "make_context"]


# ---------------------------------------------------------------------------
# Filters (devlist.hpp:53-225, opencl/filter.hpp:62-330)
# ---------------------------------------------------------------------------


class DeviceFilter:
    """Composable device predicate.

    Element-wise filters implement ``match(device)``; list-wise filters
    (Count, Position) override ``select(devices)``, mirroring the
    reference's distinction between plain predicates and the stateful
    Count/Position filters (devlist.hpp:145-181).
    """

    def match(self, dev) -> bool:  # pragma: no cover - overridden
        return True

    def select(self, devices: Sequence) -> List:
        return [d for d in devices if self.match(d)]

    def __and__(self, other: "DeviceFilter") -> "DeviceFilter":
        return _And(self, other)

    def __or__(self, other: "DeviceFilter") -> "DeviceFilter":
        return _Or(self, other)

    def __invert__(self) -> "DeviceFilter":
        return _Not(self)

    # Allow calling a filter directly on a device list.
    def __call__(self, devices: Sequence) -> List:
        return self.select(devices)


class _And(DeviceFilter):
    def __init__(self, a: DeviceFilter, b: DeviceFilter) -> None:
        self.a, self.b = a, b

    def select(self, devices: Sequence) -> List:
        return self.b.select(self.a.select(devices))


class _Or(DeviceFilter):
    def __init__(self, a: DeviceFilter, b: DeviceFilter) -> None:
        self.a, self.b = a, b

    def select(self, devices: Sequence) -> List:
        sa = self.a.select(devices)
        sb = self.b.select(devices)
        seen = {id(d) for d in sa}
        return sa + [d for d in sb if id(d) not in seen]


class _Not(DeviceFilter):
    def __init__(self, a: DeviceFilter) -> None:
        self.a = a

    def select(self, devices: Sequence) -> List:
        inner = {id(d) for d in self.a.select(devices)}
        return [d for d in devices if id(d) not in inner]


class _Pred(DeviceFilter):
    def __init__(self, fn: Callable, name: str = "pred") -> None:
        self.fn = fn
        self.name = name

    def match(self, dev) -> bool:
        return bool(self.fn(dev))


class _All(DeviceFilter):
    pass


class _Count(DeviceFilter):
    """Keep at most n devices (Filter::Count, devlist.hpp:145-156)."""

    def __init__(self, n: int) -> None:
        self.n = int(n)

    def select(self, devices: Sequence) -> List:
        return list(devices)[: self.n]


class _Position(DeviceFilter):
    """Keep only the device at position n (Filter::Position, :158-170)."""

    def __init__(self, n: int) -> None:
        self.n = int(n)

    def select(self, devices: Sequence) -> List:
        devices = list(devices)
        return [devices[self.n]] if 0 <= self.n < len(devices) else []


def _dev_name(dev) -> str:
    return getattr(dev, "device_kind", "") or str(dev)


def _dev_platform(dev) -> str:
    return getattr(dev, "platform", "") or ""


class _Env(DeviceFilter):
    """Environment-driven filter (Filter::Env, devlist.hpp:185-223).

    Reads VEXTPU_DEVICE (substring of device kind), VEXTPU_PLATFORM,
    VEXTPU_MAX_DEVICES, VEXTPU_POSITION — the analog of
    OCL_DEVICE/OCL_PLATFORM/OCL_MAX_DEVICES/OCL_POSITION.
    """

    def select(self, devices: Sequence) -> List:
        out = list(devices)
        name = os.environ.get("VEXTPU_DEVICE")
        if name:
            out = [d for d in out if name.lower() in _dev_name(d).lower()]
        plat = os.environ.get("VEXTPU_PLATFORM")
        if plat:
            out = [d for d in out if plat.lower() in _dev_platform(d).lower()]
        pos = os.environ.get("VEXTPU_POSITION")
        if pos is not None:
            out = _Position(int(pos)).select(out)
        maxd = os.environ.get("VEXTPU_MAX_DEVICES")
        if maxd is not None:
            out = out[: int(maxd)]
        return out


class _Exclusive(DeviceFilter):
    """Cross-process exclusive device ownership via lock files
    (opencl/filter.hpp:214-330, VEXCL_LOCK_DIR analog).

    A device passes only if this process can take (or already holds) an
    exclusive ``flock`` on ``$VEXTPU_LOCK_DIR/vextpu_device_<key>.lock``
    — so two cooperating processes sharing a lock dir never select the
    same device.  Locks are held for the process lifetime and released
    on exit or via :func:`release_exclusive_locks` (the reference frees
    them when the owning Context is destroyed; ours ties them to
    purge/exit, the closest analog of its global lock registry).

    The kernel releases ``flock`` automatically when the holder dies, so
    stale lock FILES are harmless (the reference's boost file_lock has
    the same property).
    """

    def __init__(self, inner: DeviceFilter) -> None:
        self.inner = inner

    @staticmethod
    def _lock_dir() -> str:
        import tempfile

        d = os.environ.get("VEXTPU_LOCK_DIR") or tempfile.gettempdir()
        os.makedirs(d, exist_ok=True)
        return d

    @staticmethod
    def _dev_key(dev) -> str:
        return f"{_dev_platform(dev) or 'dev'}_{getattr(dev, 'id', 0)}"

    def select(self, devices: Sequence) -> List:
        import fcntl

        out = []
        lock_dir = self._lock_dir()
        for dev in self.inner.select(devices):
            key = self._dev_key(dev)
            if key in _exclusive_locks:  # already ours (re-filtering)
                out.append(dev)
                continue
            path = os.path.join(lock_dir, f"vextpu_device_{key}.lock")
            try:
                fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o666)
            except OSError:
                continue  # unwritable lock dir: treat as taken
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                os.close(fd)
                continue  # held by another process
            _exclusive_locks[key] = (fd, path)
            out.append(dev)
        return out


_exclusive_locks: dict = {}


def release_exclusive_locks() -> None:
    """Release every Filter.Exclusive device lock this process holds
    (reference: locks die with their Context; filter.hpp:214-330)."""
    for key, (fd, _path) in list(_exclusive_locks.items()):
        try:
            os.close(fd)  # closing drops the flock
        except OSError:
            pass
        del _exclusive_locks[key]


import atexit

atexit.register(release_exclusive_locks)


class _FilterNamespace:
    """vex::Filter::* namespace object."""

    All = _All()
    Any = _All()
    Env = _Env()

    @staticmethod
    def Name(pattern: str) -> DeviceFilter:
        return _Pred(
            lambda d: re.search(pattern, _dev_name(d), re.IGNORECASE) is not None,
            f"Name({pattern})",
        )

    @staticmethod
    def Platform(pattern: str) -> DeviceFilter:
        return _Pred(
            lambda d: re.search(pattern, _dev_platform(d), re.IGNORECASE) is not None,
            f"Platform({pattern})",
        )

    # Vendor has no TPU meaning beyond the platform; alias it.
    Vendor = Platform

    @staticmethod
    def Type(kind: str) -> DeviceFilter:
        """Device class: 'tpu', 'gpu', 'cpu' (Filter::Type analog)."""
        return _Pred(
            lambda d: _dev_platform(d).lower() == kind.lower()
            or kind.lower() in _dev_name(d).lower(),
            f"Type({kind})",
        )

    TPU = _Pred(lambda d: _dev_platform(d) not in ("cpu",), "TPU")
    CPU = _Pred(lambda d: _dev_platform(d) == "cpu", "CPU")
    GPU = _Pred(lambda d: _dev_platform(d) == "gpu", "GPU")
    Accelerator = TPU

    #: f64 support: true when jax x64 is enabled (TPU emulates f64 slowly;
    #: the filter models the reference's DoublePrecision capability check).
    DoublePrecision = _Pred(
        lambda d: bool(jax.config.jax_enable_x64) or _dev_platform(d) == "cpu",
        "DoublePrecision",
    )

    Count = staticmethod(_Count)
    Position = staticmethod(_Position)

    Exclusive = staticmethod(_Exclusive)


Filter = _FilterNamespace()


# ---------------------------------------------------------------------------
# Context (devlist.hpp:273-391) + StaticContext (:229-252)
# ---------------------------------------------------------------------------

_current_context: Optional["Context"] = None


class Context:
    """Selected devices + the mesh and default sharding built over them.

    ``Context(filter)`` filters ``jax.devices()`` and builds a 1-D
    ``jax.sharding.Mesh`` whose single axis plays the role of the
    reference's per-device vector partition (vexcl/vector.hpp:913-916).
    Pass ``mesh_shape``/``axis_names`` for multi-axis meshes, or an
    explicit prebuilt ``mesh``.
    """

    def __init__(
        self,
        filter: Optional[DeviceFilter] = None,
        *,
        mesh: Optional[Mesh] = None,
        mesh_shape: Optional[Sequence[int]] = None,
        axis_names: Sequence[str] = ("devices",),
        set_current: bool = True,
    ) -> None:
        init_compilation_cache()
        if mesh is not None:
            self.mesh = mesh
            self.devices = list(np.asarray(mesh.devices).ravel())
        else:
            devices = list(jax.devices())
            if filter is not None:
                devices = filter.select(devices)
            if not devices:
                raise RuntimeError("Context: no devices pass the filter")
            self.devices = devices
            if mesh_shape is None:
                mesh_shape = (len(devices),)
                if len(axis_names) != 1:
                    raise ValueError("axis_names must match mesh_shape")
            arr = np.asarray(devices).reshape(tuple(mesh_shape))
            self.mesh = Mesh(arr, tuple(axis_names))
        self.axis = self.mesh.axis_names[0]
        self._queue_like = self.devices  # queue_list analog
        if set_current:
            _set_current(self)

    # -- partition/sharding ------------------------------------------------
    @property
    def size(self) -> int:
        """Number of devices (Context::size, devlist.hpp:330)."""
        return len(self.devices)

    def __len__(self) -> int:
        return self.size

    def sharding(self, *spec) -> NamedSharding:
        """NamedSharding over this context's mesh."""
        if not spec:
            spec = (self.axis,)
        return NamedSharding(self.mesh, PartitionSpec(*spec))

    @property
    def vector_sharding(self) -> NamedSharding:
        """Default 1-D row sharding for vectors (the part[] analog)."""
        return NamedSharding(self.mesh, PartitionSpec(self.axis))

    @property
    def axis_size(self) -> int:
        """Shard count along the vector-sharding axis.  On a multi-axis
        mesh this is mesh.shape[axis] — NOT ``size`` (the total device
        count): vectors shard over the first axis only and replicate
        over the rest, so distributed algorithms (sort/scan/FFT) must
        pair/gather over exactly this many blocks."""
        return int(self.mesh.shape[self.axis])

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, PartitionSpec())

    def device(self, i: int):
        return self.devices[i]

    # -- info --------------------------------------------------------------
    def __repr__(self) -> str:
        lines = [f"Context({self.size} device(s), mesh={self.mesh.shape})"]
        for i, d in enumerate(self.devices):
            lines.append(f"  {i}: {_dev_name(d)} [{_dev_platform(d)}]")
        return "\n".join(lines)

    def finish(self) -> None:
        """Block until all enqueued work completes (queue.finish analog)."""
        # jax arrays sync on block_until_ready; a context-wide barrier:
        jax.block_until_ready(
            jax.device_put(np.zeros(len(self.devices)), self.vector_sharding)
        )


def _set_current(ctx: Context) -> None:
    global _current_context
    _current_context = ctx


def current_context(required: bool = True) -> Optional[Context]:
    """StaticContext::get analog: most recently created context."""
    global _current_context
    if _current_context is None and required:
        _current_context = Context(Filter.Env)
    return _current_context


def make_context(*args, **kwargs) -> Context:
    return Context(*args, **kwargs)

"""Cross-queue ordering: markers, barriers, explicit-queue assignment.

Analog of vexcl/backend/opencl/event.hpp:50-100 (enqueue_marker /
enqueue_barrier / wait lists) and vexcl/enqueue.hpp:38-136
(``vex::enqueue(queue)(x) = expr``).

On TPU, XLA's dataflow order already serializes dependent work per device
(there are no user-visible queues to race), so:

* ``enqueue_marker`` returns a handle that becomes ready when everything
  currently enqueued has completed (a sync point, like marker+wait);
* ``enqueue_barrier`` blocks host-side until the device drains — the
  strongest ordering the reference's barrier gives;
* ``enqueue(context)`` redirects an assignment's computation to another
  context/device set (the duplicate-queue use-case of the reference:
  overlap independent streams of work).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .context import Context, current_context
from .expr.compile import evaluate

__all__ = ["Event", "enqueue_marker", "enqueue_barrier", "enqueue"]


class Event:
    """Completion handle (backend::event analog)."""

    def __init__(self, sentinel):
        self._sentinel = sentinel

    def wait(self) -> None:
        jax.block_until_ready(self._sentinel)

    @property
    def complete(self) -> bool:
        try:
            return self._sentinel.is_ready()
        except Exception:
            return True


def enqueue_marker(context: Optional[Context] = None) -> Event:
    ctx = context or current_context()
    sent = jax.device_put(np.zeros(1, np.float32), ctx.devices[0])
    return Event(sent)


def enqueue_barrier(context: Optional[Context] = None) -> None:
    (context or current_context()).finish()


class _EnqueueTarget:
    def __init__(self, context: Context):
        self.context = context

    def __call__(self, vec):
        outer = self

        class _Redirected:
            def __setitem__(_self, key, value) -> None:
                if not (isinstance(key, slice) and key == slice(None)):
                    raise TypeError("enqueue()(x)[:] = expr")
                arr = evaluate(value, n=vec.size, out_dtype=vec.dtype)
                arr = jax.device_put(arr, outer.context.devices[0])
                vec._set_array(arr)

            def assign(_self, value) -> None:
                _self[:] = value

        return _Redirected()


def enqueue(context: Context) -> _EnqueueTarget:
    """vex::enqueue(queue_list)(x) = expr (enqueue.hpp:38-136)."""
    return _EnqueueTarget(context)

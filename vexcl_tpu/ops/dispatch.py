"""Static eligibility helpers shared by the Pallas dispatch guards.

Every ``use_pallas_*`` predicate must decline multi-device inputs: a
Pallas kernel is a single-core program, and dispatching one over a
sharded global array would either fail to lower or silently compute on
a partial shard.  The reference's analog is the single-device
restriction on its hand-written kernels (e.g. FFT,
vexcl/fft/plan.hpp:218-220).  These checks are intentionally ordered
BEFORE the interpret-mode check in each guard so the 8-device CPU test
mesh exercises them (on the real rig a single chip never triggers
them — which is exactly why they must be unit-testable statically).
"""

from __future__ import annotations

__all__ = ["array_on_multiple_devices", "expr_on_multiple_devices"]


def array_on_multiple_devices(arr) -> bool:
    """True if a CONCRETE jax array is committed to >1 device.  Tracers
    (no .sharding with a device_set) answer False — dispatch decisions
    for traced values must be made from the expression's leaves instead
    (see expr_on_multiple_devices)."""
    try:
        return len(arr.sharding.device_set) > 1
    except Exception:
        return False


def expr_on_multiple_devices(expr) -> bool:
    """True if any vector/array terminal of the expression DAG lives on
    more than one device.  Walks the lazy tree, so it works even when the
    guard runs inside a trace (where leaf values are tracers but the
    container objects are still reachable)."""
    from ..expr.node import ArrayTerminal, VectorTerminal

    seen = set()
    stack = [expr]
    while stack:
        node = stack.pop()
        if id(node) in seen:
            continue
        seen.add(id(node))
        if isinstance(node, VectorTerminal):
            if array_on_multiple_devices(node.vec.storage):
                return True
        elif isinstance(node, ArrayTerminal):
            if array_on_multiple_devices(node.array):
                return True
        inner = getattr(node, "inner", None)
        if inner is not None:
            stack.append(inner)
        stack.extend(getattr(node, "children", ()))
    return False

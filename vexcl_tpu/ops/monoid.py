"""Named-monoid dispatch shared by scan_by_key / reduce_by_key.

Maps the (op, op_name) calling convention of the reference's key-wise
primitives (scan_by_key.hpp:700-760, reduce_by_key.hpp:435-470) onto the
Pallas kernel monoid tags.  Only the STANDARD callables may select a
kernel fast path: a custom op merely *named* "max" must take the generic
path, and an op_name that names no standard reduction while no callable
was given is an error — silently summing under a "prod" label was a
round-2 review finding.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp

_NAMED = {
    "max": "max", "maximum": "max", "fmax": "max",
    "min": "min", "minimum": "min", "fmin": "min",
}


def monoid_of(
    op: Optional[Callable], op_name: Optional[str]
) -> Tuple[Optional[str], Optional[Callable]]:
    """Return ``(mono, op)``: ``mono`` in {"add", "max", "min", None} and
    ``op`` backfilled with the standard callable when a name alone
    selected it.  Raises ValueError for an unrecognized op_name with no
    callable."""
    if op in (None, jnp.add) and op_name in (None, "add", "sum"):
        return "add", op
    named = _NAMED.get((op_name or "").lower())
    if named == "max" and op in (None, jnp.maximum):
        return "max", jnp.maximum
    if named == "min" and op in (None, jnp.minimum):
        return "min", jnp.minimum
    if op is None:
        raise ValueError(
            f"op_name={op_name!r} names no standard reduction; pass the "
            "callable via op= (recognized names: add/sum/max/maximum/fmax/"
            "min/minimum/fmin)"
        )
    return None, op

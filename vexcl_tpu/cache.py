"""Thread-safe object/kernel caches with a global purge registry.

TPU-native analog of vexcl/cache.hpp:49-183 (`object_cache`, `kernel_cache`,
`purge_caches`).  The reference caches compiled OpenCL/CUDA kernels keyed by
(context, source sha1); here the cached objects are jitted expression
evaluators keyed by structural expression signature, plus arbitrary scratch
objects (FFT plans, sort scratch, sparse format conversions).  XLA's own
jit cache and the persistent compilation cache form the lower tiers.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Dict, Hashable, List


class ObjectCache:
    """Thread-safe key->object cache (cache.hpp:119-162)."""

    def __init__(self, name: str = "") -> None:
        self.name = name
        self._lock = threading.Lock()
        self._store: Dict[Hashable, Any] = {}
        _register(self)

    def get(self, key: Hashable, default: Any = None) -> Any:
        with self._lock:
            return self._store.get(key, default)

    def get_or_create(self, key: Hashable, factory: Callable[[], Any]) -> Any:
        with self._lock:
            if key in self._store:
                return self._store[key]
        # Build outside the lock: factories may compile (slow) or re-enter.
        value = factory()
        with self._lock:
            return self._store.setdefault(key, value)

    def put(self, key: Hashable, value: Any) -> None:
        with self._lock:
            self._store[key] = value

    def __contains__(self, key: Hashable) -> bool:
        with self._lock:
            return key in self._store

    def __len__(self) -> int:
        with self._lock:
            return len(self._store)

    def purge(self) -> None:
        with self._lock:
            self._store.clear()


_registry_lock = threading.Lock()
_registry: List[ObjectCache] = []


def _register(cache: ObjectCache) -> None:
    with _registry_lock:
        _registry.append(cache)


def purge_caches() -> None:
    """Drop all cached compiled evaluators and scratch objects
    (cache.hpp purge_caches :170-183)."""
    with _registry_lock:
        caches = list(_registry)
    for c in caches:
        c.purge()
    _purge_fn_tokens()
    try:
        from .expr import compile as _compile

        _compile._scalar_cache.clear()
        _compile._replicated_cache.clear()
        # prune dead table registrations (weakrefs to collected arrays)
        for k in [k for k, r in _compile._replicable.items() if r() is None]:
            del _compile._replicable[k]
    except Exception:
        pass
    try:
        from . import vector as _vector

        _vector._pad_to_sharding.cache_clear()
    except Exception:
        pass
    try:
        from .context import release_exclusive_locks

        release_exclusive_locks()  # Exclusive filter locks die with the
        # caches — the reference frees them when contexts are destroyed
        # (filter.hpp:214-330)
    except Exception:
        pass
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass


# The main expression-evaluator cache (kernel_cache analog, cache.hpp:165).
kernel_cache = ObjectCache("kernels")


# --- stable per-callable tokens for structural signatures -------------------
#
# The reference keys kernels by the sha1 of the GENERATED SOURCE, so two
# user functions sharing a name can never collide (each splices its own
# body into the kernel, opencl/compiler.hpp:127-149).  Here the body is a
# Python callable that never appears in the structural signature, so the
# signature must carry the callable's identity: without it, two functions
# named "f" with different bodies would silently share one compiled
# evaluator.  Tokens hold a STRONG reference so a collected function's id
# can never be recycled onto a live token; purge_caches drops the registry
# together with the evaluators compiled from it.

_fn_token_lock = threading.Lock()
_fn_tokens: Dict[int, Any] = {}  # id(fn) -> (token, fn strong ref)
_fn_next = [0]


def fn_token(fn: Any) -> int:
    """Per-process stable token identifying a callable for signature use."""
    key = id(fn)
    with _fn_token_lock:
        hit = _fn_tokens.get(key)
        if hit is not None:
            return hit[0]
        _fn_next[0] += 1
        _fn_tokens[key] = (_fn_next[0], fn)
        return _fn_next[0]


def _purge_fn_tokens() -> None:
    with _fn_token_lock:
        _fn_tokens.clear()

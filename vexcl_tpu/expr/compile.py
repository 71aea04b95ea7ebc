"""Expression compilation + evaluation with structural caching.

Analog of `detail::assign_expression` (vexcl/operations.hpp:1818-1909) and
`assign_multiexpression` (:2081-2185): on first sight of a new expression
*structure*, build (trace + XLA-compile) a fused kernel; afterwards the hot
path is one dict lookup plus argument binding — the same warm path shape as
the reference's `cache.find + setArg + enqueue` (SURVEY §3.2).

The two cache tiers:
  1. `kernel_cache`  — signature string -> jitted callable (this module),
  2. XLA's own jit cache (retrace on new shapes/dtypes) + the persistent
     compilation cache on disk (config.init_compilation_cache).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import kernel_cache
from ..config import config
from .node import Analysis, EmitEnv, Expr, analyze

__all__ = ["ASSIGN_OPS", "evaluate", "assign_value", "evaluate_multi", "eval_expr"]

# Assignment operator table (vexcl/operations.hpp:63-96: SET, ADD, SUB, MUL,
# DIV, MOD, AND, OR, XOR, LSH, RSH).
ASSIGN_OPS = {
    "=": None,
    "+=": lambda old, new: old + new,
    "-=": lambda old, new: old - new,
    "*=": lambda old, new: old * new,
    "/=": lambda old, new: old / new,
    "%=": lambda old, new: old % new,
    "&=": lambda old, new: old & new,
    "|=": lambda old, new: old | new,
    "^=": lambda old, new: old ^ new,
    "<<=": lambda old, new: old << new,
    ">>=": lambda old, new: old >> new,
}


def _replicated_like(sh):
    """Rank-0-compatible replicated sharding over the same device set as
    an array leaf's sharding (None when the layout is exotic)."""
    if isinstance(sh, jax.sharding.NamedSharding):
        return jax.sharding.NamedSharding(sh.mesh, jax.sharding.PartitionSpec())
    if isinstance(sh, jax.sharding.SingleDeviceSharding):
        return sh
    return None


_SCALAR_TYPES = (bool, int, float, np.bool_, np.integer, np.floating)
_scalar_cache: dict = {}
_SCALAR_CACHE_MAX = 4096

# Table-like leaves registered replicable: committed ONCE per (buffer,
# device set) so sharded-expression calls stop re-broadcasting them
# (image2d sample tables, mba lattices, stencil coefficients — the same
# class of problem the scalar commit solves for Python scalars).
# id(arr) -> weakref(arr); identity is re-checked before reuse so a
# recycled id can never alias a dead table.
import weakref

_replicable: dict = {}
_replicated_cache: dict = {}
_REPLICATED_CACHE_MAX = 512


def mark_replicable(arr) -> None:
    """Register a read-only table array for per-device-set commit (the
    r2 scalar-commit design extended to array leaves, VERDICT r2 #7)."""
    try:
        if len(_replicable) >= 256:
            # prune dead registrations (and their committed copies) so a
            # loop constructing image2d/mba objects cannot accumulate
            # device buffers (r3 review finding)
            dead = [k for k, r in _replicable.items() if r() is None]
            for k in dead:
                del _replicable[k]
            for key in [key for key in _replicated_cache
                        if key[1] in dead]:
                del _replicated_cache[key]
        _replicable[id(arr)] = weakref.ref(arr)
    except TypeError:
        pass  # numpy arrays pass through device_put per call anyway


def _replicable_ref(l):
    r = _replicable.get(id(l))
    return r is not None and r() is l


def _commit_replicable(l, sh):
    """Commit a registered table leaf to a device set, once per (buffer,
    sharding) — shared by _commit_scalars (call-time commit inferred from
    the other leaves) and the enqueue() leaf placer (explicit redirect
    target; ADVICE r3: an expression whose only device leaves are tables
    must still land on the requested context)."""
    key = (sh, id(l))
    ent = _replicated_cache.get(key)
    if ent is None or ent[0]() is not l:
        if len(_replicated_cache) >= _REPLICATED_CACHE_MAX:
            _replicated_cache.clear()
        ent = (weakref.ref(l), jax.device_put(l, sh))
        _replicated_cache[key] = ent
    return ent[1]


def _commit_scalars(leaves):
    """Python/np scalar leaves ship host->device on EVERY kernel call
    (measured: the 8-device CPU mesh pays ~200 us/call broadcasting the
    scalar; the real chip pays a host->device transfer through the
    tunnel).  Scalar coefficients repeat across iterations, so commit
    each distinct (value, type) once per device set and reuse the
    committed array.  device_put preserves weak_type for Python scalars,
    so the jit signature — and the compiled kernel's dtype-promotion
    semantics (2*x stays f32 for f32 x) — is unchanged."""
    out = None
    sh = None

    def target():
        # Pick the widest device set among the array leaves: a
        # multi-device NamedSharding leaf wins (replicate the
        # scalar over its mesh); otherwise commit to the single
        # device only when EVERY array leaf lives there — an
        # auxiliary single-device array next to a sharded vector
        # must not pin the scalar (r2: stencil coefficients).
        single = None
        ok_single = True
        for a in leaves:
            s = getattr(a, "sharding", None)
            if s is None:
                continue
            if isinstance(s, jax.sharding.NamedSharding):
                if len(s.mesh.devices.flat) > 1:
                    return _replicated_like(s)
                d = next(iter(s.device_set))
            elif isinstance(s, jax.sharding.SingleDeviceSharding):
                d = next(iter(s.device_set))
            else:
                ok_single = False
                continue
            if single is None:
                single = d
            elif single != d:
                ok_single = False
        if not (ok_single and single is not None):
            return None  # mixed/exotic placement: leave as-is
        return jax.sharding.SingleDeviceSharding(single)

    for i, l in enumerate(leaves):
        if isinstance(l, _SCALAR_TYPES):
            if sh is None:
                sh = target()
                if sh is None:
                    return leaves
            # Floats key by bit pattern: 0.0 == -0.0 would collapse the
            # signed zeros into one committed entry (wrong copysign /
            # 1/(x*-0.0) results), and nan != nan would MISS on every
            # lookup, inserting a dead entry per call.
            if isinstance(l, (float, np.floating)):
                key = (sh, type(l), np.float64(l).tobytes())
            else:
                key = (sh, type(l), l)
            arr = _scalar_cache.get(key)
            if arr is None:
                if len(_scalar_cache) >= _SCALAR_CACHE_MAX:
                    _scalar_cache.clear()
                arr = jax.device_put(l, sh)
                _scalar_cache[key] = arr
            if out is None:
                out = list(leaves)
            out[i] = arr
        elif _replicable_ref(l):
            # table leaf (image2d data, mba lattice, stencil coeffs):
            # commit once per (buffer, device set) — otherwise every
            # sharded-expression call re-broadcasts it (VERDICT r2 #7)
            if sh is None:
                sh = target()
                if sh is None:
                    return leaves
            if out is None:
                out = list(leaves)
            out[i] = _commit_replicable(l, sh)
    return out if out is not None else leaves


def _env_from(analysis: Analysis, exprs: Sequence[Expr], leaves, n,
              inplace_slots: frozenset = frozenset(),
              placement_known: bool = True):
    values = {}
    seen = set()
    env = EmitEnv(values, n)
    env.placement_known = placement_known
    for e in exprs:
        stack = [e]
        while stack:
            node = stack.pop()
            nid = id(node)
            if nid in seen:
                continue
            seen.add(nid)
            if nid in analysis.slot_of:
                # load() lets terminals transform the raw leaf in-trace
                # (e.g. slice the pad off odd-size sharded vectors)
                values[nid] = node.load(leaves[analysis.slot_of[nid]])
                if analysis.slot_of[nid] in inplace_slots:
                    env.inplace.add(nid)
            stack.extend(node.children)
    return env


def _slot_single_use(exprs, analysis: Analysis, slot: int) -> bool:
    """True iff exactly ONE reference path in the expression DAG reaches a
    terminal occupying ``slot``.  Several tree nodes may dedup onto one
    slot (x*s + 2*x builds two VectorTerminals for x), and a shared node
    may be referenced by several parents — either way a Pallas kernel
    must not consume the buffer in place while another path still reads
    it.  Path-counting walk with an edge cap: a huge/heavily-shared DAG
    conservatively answers False (declining in-place costs only speed)."""
    refs = 0
    edges = 0
    stack = list(exprs)
    while stack:
        node = stack.pop()
        edges += 1
        if edges > 4096:
            return False
        if analysis.slot_of.get(id(node)) == slot:
            refs += 1
            if refs > 1:
                return False
        inner = getattr(node, "inner", None)
        if inner is not None:
            stack.append(inner)
        stack.extend(getattr(node, "children", ()))
    return refs == 1


def _build_evaluator(
    exprs: Tuple[Expr, ...],
    analysis: Analysis,
    n: Optional[int],
    post: Optional[Callable] = None,
    dtypes: Optional[Tuple] = None,
    donate: Tuple[int, ...] = (),
    inplace_slots: frozenset = frozenset(),
    placement_known: bool = True,
) -> Callable:
    """Build the traced function for this structural signature.

    The closure captures the *first* expression instance seen with this
    signature; later instances re-use it, passing their own leaves in the
    same deterministic slot order (guaranteed by the shared signature).
    """

    def run(*leaves):
        env = _env_from(analysis, exprs, leaves, n, inplace_slots,
                        placement_known)
        outs = [e.emit_cached(env) for e in exprs]
        if dtypes is not None:
            outs = [
                o if dt is None else o.astype(dt) for o, dt in zip(outs, dtypes)
            ]
        if post is not None:
            return post(*outs)
        return outs[0] if len(outs) == 1 else tuple(outs)

    jfn = jax.jit(run, donate_argnums=donate)
    if config.show_kernels:
        _shown = [False]
        inner = jfn

        def showing(*leaves):
            if not _shown[0]:
                _shown[0] = True
                print(f"-- kernel [{analysis.sig[:120]}] --")
                print(jax.make_jaxpr(run)(*leaves))
            return inner(*leaves)

        return showing
    return jfn


def _placement_sig(leaves) -> tuple:
    """Leaf-placement fingerprint for the evaluator cache key.

    Terminals whose emit() dispatches on CONCRETE leaf shardings (the
    Pallas stencil's dist/local guards, multi-device declines) bake that
    decision into the cached closure — and the closure captures the
    FIRST expression instance seen for a signature, so a later call with
    the same structure but different placement would re-trace against
    STALE leaves (r3 review finding: sharded-then-single-device stencil
    calls crashed).  Keying the cache on placement gives each
    combination its own evaluator whose captured instance matches."""
    out = []
    for l in leaves:
        sh = getattr(l, "sharding", None)
        if sh is None:
            out.append(None)
        elif isinstance(sh, jax.sharding.NamedSharding):
            out.append((id(sh.mesh), tuple(str(s) for s in sh.spec)))
        else:
            try:
                out.append(("1dev", id(next(iter(sh.device_set)))))
            except Exception:
                out.append("other")
    return tuple(out)


def _apply_leaf_transform(leaf_transform, leaves, olds=()):
    """Apply an enqueue() leaf_transform to leaves (+ old values).

    Returns (leaves_t, olds_t, placement_known): placement_known is True
    iff every DEVICE-ARRAY leaf/old came back as the SAME object — host
    leaves (numpy arrays, scalars) carry no committed placement, always
    follow the target, and must not demote placement_known (a
    same-context enqueue with a numpy operand previously lost the
    container-based dispatch decisions — code-review r3 finding)."""
    if leaf_transform is None:
        return list(leaves), list(olds), True

    def known(ts, ls):
        # host leaves and registered replicable tables carry no
        # placement decision — they follow the target via _put /
        # _commit_scalars respectively
        return all(
            t is l
            for t, l in zip(ts, ls)
            if getattr(l, "sharding", None) is not None
            and not _replicable_ref(l)
        )

    lt = [leaf_transform(l) for l in leaves]
    ot = [leaf_transform(o) for o in olds]
    return lt, ot, known(lt, leaves) and known(ot, olds)


def _normalize_shape(val, n):
    """Collapse a computed value to the assignment's (n,) shape: scalars
    broadcast; size-1 results may carry MORE dims than the target (e.g. a
    (1, 1) two-int slicer view) and must collapse to a scalar first —
    broadcast_to cannot drop axes.  Shared by the plain- and
    compound-assignment paths (ADVICE r2: the compound path only handled
    ndim==0)."""
    if n is None:
        return val
    if jnp.ndim(val) == 0:
        return jnp.broadcast_to(val, (n,))
    if jnp.shape(val) != (n,):
        return (jnp.broadcast_to(jnp.reshape(val, ()), (n,))
                if jnp.size(val) == 1 else val.reshape((n,)))
    return val


def _donate_slots(buf, leaves) -> Tuple[int, ...]:
    """Leaf slots safe to donate for ``buf``: () unless the buffer
    occupies exactly ONE slot.  Tagged terminals key slots by tag — not
    buffer identity — so the same storage can appear at several argnums
    (``x - tag(0, x)``); donating any of them then either crashes at
    execute time (multi-slot donation) or silently corrupts the other
    read (single-slot donation of a multiply-passed buffer)."""
    if buf is None:
        return ()
    slots = tuple(i for i, l in enumerate(leaves) if l is buf)
    return slots if len(slots) == 1 else ()


def _olds_donation_safe(olds, leaves) -> bool:
    """Old-value buffers (compound assignment) are safe to donate iff none
    of them is also an expression leaf (x += x*y would alias the output
    over memory another parameter still reads) and no buffer appears as
    two destinations (tie(x, x))."""
    return (
        config.donate
        and bool(olds)
        and not any(l is o for l in leaves for o in olds)
        and len({id(o) for o in olds}) == len(olds)
    )


def _check_sizes(analysis: Analysis, n: Optional[int]) -> None:
    """Elementwise size validation (VEXCL_CHECK_SIZES,
    operations.hpp:1442-1458): vector terminals reached only through
    size-preserving nodes must match the assignment size.  The sizes were
    collected during the analyze() walk — no extra traversal."""
    if config.check_sizes < 2 or n is None:
        return
    for sz in analysis.elementwise_sizes:
        if sz != n:
            raise ValueError(
                f"expression size mismatch: vector of size {sz} in "
                f"expression assigned to size {n} "
                "(set config.check_sizes=0 to disable)"
            )


def evaluate(
    expr: Expr,
    n: Optional[int] = None,
    op: str = "=",
    old: Any = None,
    out_dtype=None,
    leaf_transform: Optional[Callable] = None,
    donate_buffer=None,
    old_donatable: bool = True,
):
    """Evaluate one expression, optionally combining with the old LHS value
    for compound assignment.  Returns a jax.Array.

    ``leaf_transform`` maps each concrete leaf (and ``old``) before the
    kernel runs — used by vex.enqueue() to commit inputs to another
    context's devices so the computation executes THERE (events.py).

    ``donate_buffer`` (with ``config.donate``): the destination vector's
    storage.  When it appears among the expression leaves (``x = f(x)``
    shapes) that slot is donated so XLA aliases the output onto it — the
    in-place-update lever that roughly doubles 1-read/1-write streaming
    bandwidth on TPU (see docs/tpu_kernel_notes.md).  Safe because the
    caller replaces the destination's storage with the result.

    ``old_donatable``: pass False when ``old`` is (or may share) a buffer
    the caller does not exclusively own — e.g. a vector built from a
    user-held jax.Array (``vector._borrowed``): donating it would delete
    the user's array.
    """
    from .node import as_expr

    expr = as_expr(expr)
    combine = ASSIGN_OPS[op]

    if combine is None:
        analysis = analyze(expr)
        _check_sizes(analysis, n)
        dslots: Tuple[int, ...] = ()
        if config.donate and leaf_transform is None:
            dslots = _donate_slots(donate_buffer, analysis.leaves)
        # donated AND single-use slots may additionally be consumed
        # in place by Pallas terminals (input_output_aliases)
        ip_slots = frozenset(
            s for s in dslots if _slot_single_use((expr,), analysis, s))
        # placement keys on the leaves the kernel will actually SEE:
        # leaf_transform (enqueue redirects) moves them to another
        # context, so transform BEFORE keying (code-review r3 finding:
        # redirected calls were keyed on the source placement).  A
        # transform that leaves every device-array leaf unchanged
        # (same-context enqueue) keeps placement_known=True so
        # emit()-level Pallas dispatches reading the captured containers
        # stay valid.
        leaves, _, pk = _apply_leaf_transform(leaf_transform,
                                              analysis.leaves)
        cache_key = (analysis.sig, "=", n, out_dtype, dslots,
                     pk, _placement_sig(leaves))

        def factory():
            def post(val):
                return _normalize_shape(val, n)

            return _build_evaluator((expr,), analysis, n, post=post,
                                    dtypes=(out_dtype,), donate=dslots,
                                    inplace_slots=ip_slots,
                                    placement_known=pk)

        jfn = (
            kernel_cache.get_or_create(cache_key, factory)
            if config.cache_kernels
            else factory()
        )
        return jfn(*_commit_scalars(leaves))

    # compound: old value becomes leaf 0
    analysis = analyze(expr)
    _check_sizes(analysis, n)
    donate_old = old_donatable and _olds_donation_safe((old,), analysis.leaves)
    leaves, olds_t, pk = _apply_leaf_transform(leaf_transform,
                                               analysis.leaves, (old,))
    old = olds_t[0]
    cache_key = (analysis.sig, op, n, out_dtype, donate_old,
                 pk, _placement_sig(leaves))

    def factory():
        def run(old_val, *leaves):
            env = _env_from(analysis, (expr,), leaves, n,
                            placement_known=pk)
            val = _normalize_shape(expr.emit_cached(env), n)
            res = combine(old_val, val)
            return res.astype(out_dtype) if out_dtype is not None else res

        donate = (0,) if donate_old else ()
        return jax.jit(run, donate_argnums=donate)

    jfn = (
        kernel_cache.get_or_create(cache_key, factory)
        if config.cache_kernels
        else factory()
    )
    return jfn(old, *_commit_scalars(leaves))


def assign_value(vec, value, op: str = "=") -> None:
    """Drive an assignment onto a vector container."""
    borrowed = getattr(vec, "_borrowed", False)
    arr = evaluate(
        value, n=vec.size, op=op, old=vec.array if op != "=" else None,
        out_dtype=vec.dtype,
        donate_buffer=(vec.storage
                       if op == "=" and not getattr(vec, "_pad", 0)
                       and not borrowed
                       else None),
        old_donatable=not borrowed,
    )
    vec._set_array(arr)


def evaluate_multi(
    exprs: Sequence[Expr],
    ns: Sequence[Optional[int]],
    ops: Sequence[str],
    olds: Sequence[Any],
    out_dtypes: Sequence[Any],
    donate_buffers: Optional[Sequence[Any]] = None,
    olds_donatable: Optional[Sequence[bool]] = None,
    leaf_transform: Optional[Callable] = None,
) -> Tuple:
    """Fused evaluation of N expressions in ONE compiled kernel.

    Analog of assign_multiexpression / vex::tie (operations.hpp:2081-2185,
    :2251): all component expressions are traced into a single jitted
    function so XLA emits one fused kernel, sharing common subexpression
    loads exactly like the reference's fused multivector kernels.

    ``olds_donatable`` (aligned with ``olds``): False entries mark old
    values whose buffer the caller does not exclusively own (borrowed
    storage, ``vector._borrowed``) — donation of the olds tuple is
    all-or-nothing, so any False disables it.

    ``leaf_transform`` maps each concrete leaf (and old) before the kernel
    runs — vex.enqueue()'s redirect for tied/multivector assignments
    (enqueue_multiexpression, tests/events.cpp); disables buffer donation
    exactly like the single-expression path.
    """
    from .node import as_expr

    exprs = tuple(as_expr(e) for e in exprs)
    if config.check_sizes >= 2:
        for e, n in zip(exprs, ns):
            _check_sizes(analyze(e), n)
    analysis = analyze(*exprs)
    need_old = [ASSIGN_OPS[op] is not None for op in ops]
    olds_real = [o for o, ne in zip(olds, need_old) if ne]
    donate_olds = _olds_donation_safe(olds_real, analysis.leaves) and (
        olds_donatable is None
        or all(d for d, ne in zip(olds_donatable, need_old) if ne)
    )
    # pure-"=" fused assignments (tie(x, y) = (f(x), g(y))): donate each
    # destination storage occupying exactly one leaf slot, same rule as the
    # single-expression path.  Leaves sit at argnums 1.. (argnum 0 is the
    # olds tuple); skipped whenever any old is in play so a buffer can
    # never be donated through both routes at once.
    dslots: Tuple[int, ...] = ()
    if (config.donate and donate_buffers and not olds_real
            and leaf_transform is None):
        bufs = [b for b in donate_buffers if b is not None]
        if len({id(b) for b in bufs}) == len(bufs):
            dslots = tuple(
                s + 1 for b in bufs for s in _donate_slots(b, analysis.leaves)
            )
    leaves, olds_real, pk = _apply_leaf_transform(leaf_transform,
                                                  analysis.leaves, olds_real)
    cache_key = (
        analysis.sig,
        tuple(ops),
        tuple(ns),
        tuple(out_dtypes),
        donate_olds,
        dslots,
        pk,
        _placement_sig(leaves),
    )

    def factory():
        def run(olds_in, *leaves):
            env = _env_from(analysis, exprs, leaves, None,
                            placement_known=pk)
            outs = []
            oi = 0
            for i, e in enumerate(exprs):
                env.n = ns[i]
                val = _normalize_shape(e.emit_cached(env), ns[i])
                if need_old[i]:
                    val = ASSIGN_OPS[ops[i]](olds_in[oi], val)
                    oi += 1
                if out_dtypes[i] is not None:
                    val = val.astype(out_dtypes[i])
                outs.append(val)
            return tuple(outs)

        donate = (0,) if donate_olds else dslots
        return jax.jit(run, donate_argnums=donate)

    jfn = (
        kernel_cache.get_or_create(cache_key, factory)
        if config.cache_kernels
        else factory()
    )
    return jfn(tuple(olds_real), *_commit_scalars(leaves))


def eval_expr(expr: Expr):
    """vex::eval(expr) (eval.hpp:38-110): evaluate for value/side effects
    without assigning to a container; returns the computed array."""
    from .node import as_expr, expression_properties

    from ..ops.atomic import AtomicUpdate

    if isinstance(expr, AtomicUpdate):
        return expr.execute()
    expr = as_expr(expr)
    n, _ = expression_properties(expr)
    # Views/partial reductions shrink the output: prefer the expression's
    # own size over the terminal size (vector_view.hpp's
    # expression_properties do the same via the view's size())
    hint = expr.size_hint()
    return evaluate(expr, n=n if hint is None else hint)

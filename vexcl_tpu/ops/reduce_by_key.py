"""Segmented reduction: reduce_by_key.

Analog of vexcl/reduce_by_key.hpp:435-585 (Bolt-derived, single-device).

TPU-native design: segmented inclusive scan (one `associative_scan`) +
tail extraction.  The output length equals the number of distinct key runs
— inherently data-dependent, so like the reference (which resizes host-side
after counting) we do one scalar device->host sync for the count, then a
device-side compaction gather.  Returns (keys_out, vals_out, count).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import kernel_cache
from ..config import config
from ..vector import vector
from .scan_by_key import _key_arrays

__all__ = ["reduce_by_key"]


def _rbk_stage1_fused(nkeys: int, mono: str = "add"):
    """(vals, keys...) -> (pos, stats, incl_c, keys_c...) via the r3
    FUSED kernel (ops/pallas_rbk.py): segmented scan + per-row
    compaction in one Pallas pass — the r2 three-dispatch pipeline's
    block compaction alone cost 2.36 ms of 3.68 at 16M
    (exp/rbk_stage_probe.py).  Tails derive from one fused XLA compare;
    heads derive in-kernel."""
    from .pallas_rbk import pallas_segscan_rowcompact

    def run(vals_in, *keys_in):
        neq = keys_in[0][1:] != keys_in[0][:-1]
        for k in keys_in[1:]:
            neq = neq | (k[1:] != k[:-1])
        tails = jnp.concatenate([neq.astype(jnp.int8),
                                 jnp.ones((1,), jnp.int8)])
        pos, incl_c, *keys_c = pallas_segscan_rowcompact(
            tails, vals_in, *keys_in, mono=mono)
        valid = pos >= 0.0
        rowcounts = jnp.sum(valid.astype(jnp.int32), axis=1)
        stats = jnp.stack([jnp.sum(rowcounts), jnp.max(rowcounts)])
        return (pos, stats, incl_c) + tuple(keys_c)

    return jax.jit(run)


def _rbk_stage2_fused(kpad: int, nkeys: int):
    """Row-granular sized assembly: each row's compacted region
    truncates to kpad <= 128 slots; row-major (row, slot) order is
    global order, so one flat-index-keyed sort of rows*kpad elements
    pulls the runs together."""

    def run(pos, incl_c, *keys_c):
        valid = pos[:, :kpad] >= 0.0
        rows = pos.shape[0]
        flat = jnp.arange(rows * kpad, dtype=jnp.int32)
        sortkey = jnp.where(valid.reshape(-1), flat,
                            jnp.int32(np.iinfo(np.int32).max))
        outs = jax.lax.sort(
            (sortkey, incl_c[:, :kpad].reshape(-1))
            + tuple(k[:, :kpad].reshape(-1) for k in keys_c),
            num_keys=1)
        return outs[1:]

    return jax.jit(run)


def _reduce_by_key_fused(karrs, vals, okeys, ovals, multi, mono="add"):
    """r3 fused fast path (see _rbk_stage1_fused)."""
    nk = len(karrs)
    jfn1 = (kernel_cache.get_or_create(("rbk_fused1", nk, mono),
                                       lambda: _rbk_stage1_fused(nk, mono))
            if config.cache_kernels else _rbk_stage1_fused(nk, mono))
    pos, stats, incl_c, *keys_c = jfn1(vals.array, *karrs)
    st = np.asarray(stats)  # the one host sync (reference resizes too)
    m, cmax = int(st[0]), int(st[1])
    ctx = vals.context
    if m == vals.size:
        # degenerate all-distinct keys: identity reduction, skip assembly
        out_val_arr = vals.array.copy()
        out_key_arrs = [k.copy() for k in karrs]
    else:
        kpad = min(128, max(2, -(-cmax // 2) * 2))  # bucket of 2
        jfn2 = (kernel_cache.get_or_create(("rbk_fused2", kpad, nk),
                                           lambda: _rbk_stage2_fused(kpad, nk))
                if config.cache_kernels else _rbk_stage2_fused(kpad, nk))
        vals_full, *keys_full = jfn2(pos, incl_c, *keys_c)
        # the kernel accumulates in f32 (bf16 inputs upcast in-kernel);
        # emitted values match the input dtype like the generic path
        out_val_arr = vals_full[:m].astype(vals.dtype)
        out_key_arrs = [k[:m] for k in keys_full]
    return _emit_outputs(out_val_arr, out_key_arrs, okeys, ovals, multi,
                         ctx, m)


def _emit_outputs(out_val_arr, out_key_arrs, okeys, ovals, multi, ctx, m):
    if ovals is None:
        ovals = vector(data=out_val_arr, context=ctx)
    else:
        ovals._set_array(out_val_arr.astype(ovals.dtype))
    if okeys is None:
        okeys_out = [vector(data=k, context=ctx) for k in out_key_arrs]
    else:
        okeys_list = list(okeys) if isinstance(okeys, (tuple, list)) else [okeys]
        for dst, arr in zip(okeys_list, out_key_arrs):
            dst._set_array(arr.astype(dst.dtype))
        okeys_out = okeys_list
    if not multi:
        return okeys_out[0], ovals, m
    return tuple(okeys_out), ovals, m


def _rbk_stage1(nkeys: int, mono: str = "add"):
    """(keys..., vals) -> block-compacted (sums, keys...) + counts:
    segmented scan + payload-transporting block compaction, one fused
    program (no global cumsum, no sort, no big-table gathers — measured
    take-from-16M runs at only ~70 Melem/s on v5e).  Tuple keys combine
    into the head flags in the same fused pre-pass (rbk_tuple parity,
    reduce_by_key.hpp fusion-key path); ``mono`` selects add/max/min."""
    from .pallas_compact import pallas_compact
    from .pallas_segscan import pallas_segmented_cumsum_flags

    def run(vals_in, *keys_in):
        neq = keys_in[0][1:] != keys_in[0][:-1]
        for k in keys_in[1:]:
            neq = neq | (k[1:] != k[:-1])
        heads = jnp.concatenate([jnp.ones((1,), jnp.int8),
                                 neq.astype(jnp.int8)])
        tails = jnp.concatenate([neq.astype(jnp.int8),
                                 jnp.ones((1,), jnp.int8)])
        incl = pallas_segmented_cumsum_flags(heads, vals_in, mono)
        out = pallas_compact(tails, incl, *keys_in)
        pos, counts = out[0], out[1]
        # total + max in ONE array: each host scalar fetch is a full
        # tunnel round trip (~30-400 ms).  Sum as i32: per-block counts
        # are f32-exact (<= block size) but an f32 TOTAL loses exactness
        # past 2^24 runs (code-review r2 finding).
        ci = counts.astype(jnp.int32)
        stats = jnp.stack([jnp.sum(ci), jnp.max(ci)])
        return (pos, counts, stats) + tuple(out[2:])

    return jax.jit(run)


def _rbk_stage2(kpad: int, nkeys: int):
    """Assembly sized by the SYNCED max block count: truncate each block's
    compacted region to kpad slots (all valid entries live in the first
    counts[b] <= kpad), then ONE small sort over nblocks*kpad elements
    pulls the blocks' runs together in order.  Typical segment sizes make
    nblocks*kpad << N, so the r1 full-N compaction sort (the whole 0.31
    Gelem/s bottleneck) shrinks to a ~1 ms epilogue; in the degenerate
    all-distinct-keys case kpad = BLOCK and this equals the r1 cost."""

    def run(pos, incl_c, *keys_c):
        valid = pos[:, :kpad] >= 0.0
        nb = pos.shape[0]
        flat = jnp.arange(nb * kpad, dtype=jnp.int32)
        sortkey = jnp.where(valid.reshape(-1), flat,
                            jnp.int32(np.iinfo(np.int32).max))
        outs = jax.lax.sort(
            (sortkey, incl_c[:, :kpad].reshape(-1))
            + tuple(k[:, :kpad].reshape(-1) for k in keys_c),
            num_keys=1)
        return outs[1:]

    return jax.jit(run)


def _reduce_by_key_compact(karrs, vals, okeys, ovals, multi, mono="add"):
    """Pallas fast path: segscan + block compaction + sized assembly."""
    nk = len(karrs)
    jfn1 = (kernel_cache.get_or_create(("rbk_stage1", nk, mono),
                                       lambda: _rbk_stage1(nk, mono))
            if config.cache_kernels else _rbk_stage1(nk, mono))
    pos, counts, stats, incl_c, *keys_c = jfn1(vals.array, *karrs)
    st = np.asarray(stats)  # the one host sync (reference resizes too)
    m, cmax = int(st[0]), int(st[1])
    ctx = vals.context
    if m == vals.size:
        # degenerate all-distinct keys: every element is its own run, the
        # reduction is the identity — skip the stage-2 assembly sort
        # entirely (it would cost a full-N sort, the r1 bottleneck).
        # Copy so outputs never share buffers with inputs (config.donate
        # may later invalidate the inputs' storage in place).
        out_val_arr = vals.array.copy()
        out_key_arrs = [k.copy() for k in karrs]
    else:
        # kpad bucket: multiple of 512 bounds stage-2 recompiles
        kpad = min(pos.shape[1], max(512, -(-cmax // 512) * 512))
        jfn2 = (kernel_cache.get_or_create(("rbk_stage2", kpad, nk),
                                           lambda: _rbk_stage2(kpad, nk))
                if config.cache_kernels else _rbk_stage2(kpad, nk))
        vals_full, *keys_full = jfn2(pos, incl_c, *keys_c)
        out_val_arr = vals_full[:m]
        out_key_arrs = [k[:m] for k in keys_full]
    return _emit_outputs(out_val_arr, out_key_arrs, okeys, ovals, multi,
                         ctx, m)


def reduce_by_key(
    keys: Union[vector, Sequence[vector]],
    vals: vector,
    okeys: Optional[Union[vector, Sequence[vector]]] = None,
    ovals: Optional[vector] = None,
    op: Optional[Callable] = None,
    op_name: Optional[str] = None,
    key_eq: Optional[Callable] = None,
) -> Tuple:
    """Reduce runs of equal (tuples of) keys; returns (okeys, ovals, count).

    If ``okeys``/``ovals`` containers are passed they are resized and filled
    (reference calling convention, reduce_by_key.hpp:435); otherwise new
    vectors are returned.
    """
    ks = _key_arrays(keys)
    multi = isinstance(keys, (tuple, list))

    # Pallas fast path eligibility (static): the segmented scan dominates
    # the cost; tail extraction/compaction stays XLA either way.
    from .pallas_compact import use_pallas_compact
    from .pallas_segscan import use_pallas_segscan

    all_int_keys = all(jnp.issubdtype(k.dtype, jnp.integer) for k in ks)
    from .monoid import monoid_of

    mono, op = monoid_of(op, op_name)

    seg_pallas = (mono is not None and key_eq is None and all_int_keys
                  and use_pallas_segscan(ks[0], vals.array, None, None))

    # both Pallas compaction kernels transport keys as 32/64-bit f32
    # bit-pattern planes; i8/i16 keys pass the segscan guard but must
    # take the generic path (code-review r2 finding: the mismatch
    # crashed instead of falling back)
    keys_32_64 = all(np.dtype(k.dtype).itemsize in (4, 8) for k in ks)
    # the r2 pallas_compact additionally transports the VALUES as planes,
    # so it needs 32/64-bit values too; the fused kernel upcasts bf16
    # values in-kernel (code-review r3 finding: the r2-era gate wrongly
    # kept bf16 off the fused path)
    vals_32_64 = np.dtype(vals.dtype).itemsize in (4, 8)

    if seg_pallas and keys_32_64:
        # r3 fused kernel (segscan + row compaction in ONE pass,
        # ops/pallas_rbk.py) for n <= 2^24 (f32-exact positions); the
        # r2 three-dispatch pipeline covers larger n
        from .pallas_rbk import use_pallas_rbk

        if use_pallas_rbk(ks, vals.array, vals.size):
            return _reduce_by_key_fused(ks, vals, okeys, ovals, multi,
                                        mono)
        if vals_32_64 and all(use_pallas_compact(k) for k in ks):
            return _reduce_by_key_compact(ks, vals, okeys, ovals, multi,
                                          mono)

    # generic path: the inline segscan below is add-only single-key
    seg_pallas = seg_pallas and len(ks) == 1 and mono == "add"

    cache_key = ("reduce_by_key", op_name or "add",
                 id(op) if op is not None else None,
                 key_eq is not None, len(ks), seg_pallas)

    def factory():
        def run(vals_in, *ks_in):
            fn = op or jnp.add
            n = vals_in.shape[0]
            if key_eq is not None:
                eq = key_eq(*[k[:-1] for k in ks_in], *[k[1:] for k in ks_in])
            else:
                eq = jnp.ones(n - 1, dtype=bool)
                for k in ks_in:
                    eq = eq & (k[:-1] == k[1:])
            heads = jnp.concatenate([jnp.ones((1,), bool), ~eq])
            tails = jnp.concatenate([~eq, jnp.ones((1,), bool)])

            def combine(a, b):
                fa, va = a
                fb, vb = b
                return fa | fb, jnp.where(fb, vb, fn(va, vb))

            if seg_pallas:
                from .pallas_segscan import pallas_segmented_cumsum

                incl = pallas_segmented_cumsum(ks_in[0], vals_in)
            else:
                _, incl = jax.lax.associative_scan(combine, (heads, vals_in))
            # rank of each segment tail among tails -> compacted position
            seg_id = jnp.cumsum(heads) - 1
            count = seg_id[-1] + 1
            # Compaction rides the SORT network: an XLA scatter of 16M
            # runs at 0.14 Gelem/s on v5e (sequential lowering;
            # unique_indices does not help) while lax.sort moves the same
            # pairs at 0.31 — TPUs hate scatters, the sort network is the
            # compaction primitive.  Tails carry the segment's key too
            # (all keys in a segment are equal), so ONE sort compacts
            # values and keys together.
            big = jnp.int32(np.iinfo(np.int32).max)
            sk = jnp.where(tails, seg_id, big)
            if key_eq is None:
                sorted_out = jax.lax.sort((sk, incl) + tuple(ks_in),
                                          num_keys=1)
                vals_out = sorted_out[1]
                keys_out = tuple(sorted_out[2:])
            else:
                # custom equivalence: keys within a run may differ — the
                # reference reports the run's FIRST key, so compact heads
                # in a second sort
                _, vals_out = jax.lax.sort((sk, incl), num_keys=1)
                hk = jnp.where(heads, seg_id, big)
                keys_out = tuple(
                    jax.lax.sort((hk,) + tuple(ks_in), num_keys=1)[1:])
            return count, vals_out, keys_out

        return jax.jit(run)

    jfn = (
        kernel_cache.get_or_create(cache_key, factory)
        if config.cache_kernels
        else factory()
    )
    count, vals_full, keys_full = jfn(vals.array, *ks)
    m = int(count)  # one scalar sync, as in the reference's host resize

    ctx = vals.context
    out_val_arr = vals_full[:m]
    out_key_arrs = [k[:m] for k in keys_full]
    return _emit_outputs(out_val_arr, out_key_arrs, okeys, ovals, multi,
                         ctx, m)

"""ctypes loader for the native C++ helper library.

The reference is native C++ throughout; here the TPU compute path is
XLA/Pallas and this library covers the host-side runtime hot spots (format
repacking, merge passes) — see native/vexcl_native.cpp.  Built on first use
with g++ (cached next to the source); every entry point has a pure-numpy
fallback at its call site, so a missing toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "vexcl_native.cpp"


def _build(so_path: Path) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
        str(_SRC), "-o", str(so_path),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        # retry without openmp/march (portability)
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", str(_SRC), "-o", str(so_path)],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except Exception:
            return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SRC.exists():
            return None
        cache_dir = Path(
            os.environ.get("VEXTPU_CACHE_DIR") or os.path.expanduser("~/.vexcl_tpu")
        )
        try:
            cache_dir.mkdir(parents=True, exist_ok=True)
        except Exception:
            return None
        so_path = cache_dir / "vexcl_native.so"
        if not so_path.exists() or so_path.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build(so_path):
                return None
        try:
            lib = ctypes.CDLL(str(so_path))
        except OSError:
            return None

        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        f32p = ctypes.POINTER(ctypes.c_float)
        u32p = ctypes.POINTER(ctypes.c_uint32)

        lib.csr_to_ell_f64.argtypes = [ctypes.c_int64, i64p, i32p, f64p,
                                       ctypes.c_int64, i32p, f64p]
        lib.csr_to_ell_f32.argtypes = [ctypes.c_int64, i64p, i32p, f32p,
                                       ctypes.c_int64, i32p, f32p]
        lib.kway_merge_f64.argtypes = [ctypes.c_int64, i64p, f64p, i64p,
                                       f64p, i64p]
        lib.philox4x32_host.argtypes = [ctypes.c_int64, ctypes.c_uint32,
                                        ctypes.c_uint32, u32p]
        for fn in (lib.scatter_add_f64, lib.scatter_add_f32):
            fn.argtypes = [ctypes.c_int64, i64p,
                           f64p if fn is lib.scatter_add_f64 else f32p,
                           f64p if fn is lib.scatter_add_f64 else f32p]
        lib.edge_color_pow2.argtypes = [ctypes.c_int64, i64p, i64p,
                                        ctypes.c_int64, ctypes.c_int32, i32p]
        lib.edge_color_pow2_seg.argtypes = [ctypes.c_int64, i64p, i64p,
                                            ctypes.c_int64, ctypes.c_int32,
                                            ctypes.c_int64, i32p]
        lib.edge_color_rows_i32.argtypes = [ctypes.c_int64, i32p,
                                            ctypes.c_int64, ctypes.c_int32,
                                            ctypes.c_int64, i32p]
        if hasattr(lib, "group_rank_i32"):
            lib.group_rank_i32.argtypes = [ctypes.c_int64, i32p,
                                           ctypes.c_int64, i32p]
            lib.expand_rows_i32.argtypes = [ctypes.c_int64, i64p, i32p, i32p]
            lib.perm_complete_i32.argtypes = [ctypes.c_int64, i32p]
        if hasattr(lib, "edge_color_perm_i32"):
            lib.edge_color_perm_i32.argtypes = [ctypes.c_int64, i32p,
                                                ctypes.c_int64, i32p]
            lib.edge_color_perm_i32.restype = ctypes.c_int
        if hasattr(lib, "plan_scatter_a_i32"):
            lib.plan_scatter_a_i32.argtypes = [ctypes.c_int64, i32p, i32p]
            lib.plan_scatter_c_i32.argtypes = [ctypes.c_int64,
                                               ctypes.c_int64, i32p, i32p,
                                               i32p]
            lib.plan_scatter_b_i32.argtypes = [ctypes.c_int64,
                                               ctypes.c_int64,
                                               ctypes.c_int, i32p, i32p,
                                               i32p]
            lib.plan_t_next_i32.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                            i32p, i32p, i32p]
            lib.plan_scatter_freelanes_i32.argtypes = [ctypes.c_int64,
                                                       i32p, i32p, i32p]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def csr_to_ell(n, ptr, col, val, width):
    """Native CSR->ELL repack; raises if the library is unavailable so the
    caller can fall back to numpy."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = int(n)
    width = int(width)
    ptr = np.ascontiguousarray(ptr, dtype=np.int64)
    col = np.ascontiguousarray(col, dtype=np.int32)
    ecol = np.full((n, width), -1, dtype=np.int32)
    if np.asarray(val).dtype == np.float32:
        val = np.ascontiguousarray(val, dtype=np.float32)
        eval_ = np.zeros((n, width), dtype=np.float32)
        lib.csr_to_ell_f32(n, _ptr(ptr, ctypes.c_int64), _ptr(col, ctypes.c_int32),
                           _ptr(val, ctypes.c_float), width,
                           _ptr(ecol, ctypes.c_int32), _ptr(eval_, ctypes.c_float))
    else:
        val = np.ascontiguousarray(val, dtype=np.float64)
        eval_ = np.zeros((n, width), dtype=np.float64)
        lib.csr_to_ell_f64(n, _ptr(ptr, ctypes.c_int64), _ptr(col, ctypes.c_int32),
                           _ptr(val, ctypes.c_double), width,
                           _ptr(ecol, ctypes.c_int32), _ptr(eval_, ctypes.c_double))
    return ecol, eval_


def kway_merge(offsets, keys, vals=None):
    """Merge sorted runs; returns (keys_sorted, payload_order)."""
    lib = get_lib()
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    keys = np.ascontiguousarray(keys, dtype=np.float64)
    n = int(offsets[-1])
    if vals is None:
        vals = np.arange(n, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    if lib is None:
        order = np.argsort(keys, kind="stable")
        return keys[order], vals[order]
    okeys = np.empty(n, dtype=np.float64)
    ovals = np.empty(n, dtype=np.int64)
    lib.kway_merge_f64(len(offsets) - 1, _ptr(offsets, ctypes.c_int64),
                       _ptr(keys, ctypes.c_double), _ptr(vals, ctypes.c_int64),
                       _ptr(okeys, ctypes.c_double), _ptr(ovals, ctypes.c_int64))
    return okeys, ovals


def scatter_add(out: np.ndarray, idx: np.ndarray, val: np.ndarray) -> None:
    """out[idx[i]] += val[i] with duplicate accumulation, in place.

    Native when available; falls back to np.add.at (slow but correct).
    Complex values split into two real passes."""
    if np.issubdtype(out.dtype, np.complexfloating):
        scalar = np.float32 if out.dtype == np.complex64 else np.float64
        re = np.ascontiguousarray(val.real, dtype=scalar)
        im = np.ascontiguousarray(val.imag, dtype=scalar)
        ore = np.zeros(len(out), dtype=scalar)
        oim = np.zeros(len(out), dtype=scalar)
        scatter_add(ore, idx, re)
        scatter_add(oim, idx, im)
        out += ore
        out += 1j * oim
        return
    lib = get_lib()
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if lib is None:
        np.add.at(out, idx, val.astype(out.dtype))
        return
    if out.dtype == np.float32:
        val = np.ascontiguousarray(val, dtype=np.float32)
        lib.scatter_add_f32(len(idx), _ptr(idx, ctypes.c_int64),
                            _ptr(val, ctypes.c_float), _ptr(out, ctypes.c_float))
    elif out.dtype == np.float64:
        val = np.ascontiguousarray(val, dtype=np.float64)
        lib.scatter_add_f64(len(idx), _ptr(idx, ctypes.c_int64),
                            _ptr(val, ctypes.c_double), _ptr(out, ctypes.c_double))
    else:
        np.add.at(out, idx, val.astype(out.dtype))


def philox_host(n: int, seed: int) -> np.ndarray:
    """Host Philox4x32-10 reference stream: (n, 4) uint32."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty((int(n), 4), dtype=np.uint32)
    lib.philox4x32_host(int(n), np.uint32(seed & 0xFFFFFFFF),
                        np.uint32((seed >> 32) & 0xFFFFFFFF),
                        _ptr(out, ctypes.c_uint32))
    return out


def group_rank(keys: np.ndarray, nkeys: int) -> np.ndarray:
    """rank[i] = #{j < i : keys[j] == keys[i]} (keys in [0, nkeys)).

    Native counting pass when available (the counter array is cache-
    resident at the SELLR planner's key ranges); numpy fallback uses the
    argsort+searchsorted pattern (~7 s/16.8M on the bench host)."""
    keys = np.ascontiguousarray(keys, dtype=np.int32)
    lib = get_lib()
    if lib is not None and hasattr(lib, "group_rank_i32"):
        rank = np.empty(len(keys), dtype=np.int32)
        lib.group_rank_i32(len(keys), _ptr(keys, ctypes.c_int32),
                           int(nkeys), _ptr(rank, ctypes.c_int32))
        return rank
    o = np.argsort(keys, kind="stable")
    s = keys[o]
    g = np.searchsorted(s, s, side="left")
    rank = np.empty(len(keys), dtype=np.int32)
    rank[o] = (np.arange(len(keys)) - g).astype(np.int32)
    return rank


def expand_rows(ptr: np.ndarray):
    """(rows_of, within) for CSR entries: entry k belongs to row rows_of[k]
    at in-row slot within[k].  Fused native pass; numpy fallback."""
    ptr = np.ascontiguousarray(ptr, dtype=np.int64)
    n = len(ptr) - 1
    nnz = int(ptr[-1])
    lib = get_lib()
    if lib is not None and hasattr(lib, "expand_rows_i32"):
        rows_of = np.empty(nnz, dtype=np.int32)
        within = np.empty(nnz, dtype=np.int32)
        lib.expand_rows_i32(n, _ptr(ptr, ctypes.c_int64),
                            _ptr(rows_of, ctypes.c_int32),
                            _ptr(within, ctypes.c_int32))
        return rows_of, within
    row_len = np.diff(ptr)
    rows_of = np.repeat(np.arange(n, dtype=np.int32), row_len)
    within = (np.arange(nnz, dtype=np.int64)
              - np.repeat(ptr[:-1], row_len)).astype(np.int32)
    return rows_of, within


def perm_complete(dst: np.ndarray) -> np.ndarray:
    """Fill the negative slots of a partial permutation over [0, len(dst))
    with the unused values in ascending order, in place.  Returns dst."""
    assert dst.dtype == np.int32 and dst.flags.c_contiguous
    lib = get_lib()
    if lib is not None and hasattr(lib, "perm_complete_i32"):
        lib.perm_complete_i32(len(dst), _ptr(dst, ctypes.c_int32))
        return dst
    free = np.nonzero(dst < 0)[0]
    used = np.zeros(len(dst), dtype=bool)
    used[dst[dst >= 0]] = True
    dst[free] = np.nonzero(~used)[0][: len(free)].astype(np.int32)
    return dst


def edge_color(su, dv, nv, d, seg=None):
    """Native Konig 128-edge-coloring (Euler splits) for the shuffle-route
    planner; raises if unavailable (python fallback in shuffle_plan.py).
    ``seg``: edges [k*seg, (k+1)*seg) are vertex-disjoint groups (the
    planner's per-group grids) — coloring them independently keeps the
    working set cache-resident."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "edge_color_pow2_seg"):
        raise RuntimeError("native library unavailable")
    if len(su) >= 2**31 or 2 * int(nv) >= 2**31:
        raise RuntimeError("int32 limit in native edge coloring")
    su = np.ascontiguousarray(su, dtype=np.int64)
    dv = np.ascontiguousarray(dv, dtype=np.int64)
    colors = np.empty(len(su), dtype=np.int32)
    lib.edge_color_pow2_seg(len(su), _ptr(su, ctypes.c_int64),
                            _ptr(dv, ctypes.c_int64), int(nv), int(d),
                            int(seg or len(su)),
                            _ptr(colors, ctypes.c_int32))
    return colors


def edge_color_rows(dvrow, nv, d, seg=None):
    """Native coloring for the planner's row-major grids: the source
    vertex of edge i is implicitly i // 128, so only the int32 dst-row
    array is passed (the int64 su/dv materialization dominated planning
    time on the bench host).

    Fast path (r5): every grid the planner builds is a full PERMUTATION
    (exactly-128-regular on both sides) whose stable splits keep per-row
    edge blocks contiguous — `edge_color_perm_i32` exploits that to color
    with ~2 memory ops per edge-level instead of rebuilding incidence
    every level.  It validates the structure and returns nonzero if
    violated, falling back to the general path."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "edge_color_rows_i32"):
        raise RuntimeError("native library unavailable")
    if len(dvrow) >= 2**31 or 2 * int(nv) >= 2**31:
        raise RuntimeError("int32 limit in native edge coloring")
    dvrow = np.ascontiguousarray(dvrow, dtype=np.int32)
    colors = np.empty(len(dvrow), dtype=np.int32)
    if d == 128 and hasattr(lib, "edge_color_perm_i32"):
        rc = lib.edge_color_perm_i32(len(dvrow),
                                     _ptr(dvrow, ctypes.c_int32),
                                     int(seg or len(dvrow)),
                                     _ptr(colors, ctypes.c_int32))
        if rc == 0:
            return colors
    lib.edge_color_rows_i32(len(dvrow), _ptr(dvrow, ctypes.c_int32),
                            int(nv), int(d), int(seg or len(dvrow)),
                            _ptr(colors, ctypes.c_int32))
    return colors


# ---------------------------------------------------------------------------
# Fused Benes-plan scatter passes (r5): one C pass each, no 67 MB int32
# position temps (the numpy forms cost ~7 s at 16.8M on the bench host).
# ``colors=None`` means colors[p] = p & 127 (known_colors).  All return
# None and raise RuntimeError when the library is unavailable — callers
# keep their numpy fallbacks.
# ---------------------------------------------------------------------------


def _plan_lib():
    lib = get_lib()
    if lib is None or not hasattr(lib, "plan_scatter_a_i32"):
        raise RuntimeError("native library unavailable")
    return lib


def _c32(a):
    return np.ascontiguousarray(a.reshape(-1), dtype=np.int32)


def plan_scatter_a(rows, colors):
    lib = _plan_lib()
    colors = _c32(colors)
    out = np.empty(rows * 128, dtype=np.int32)
    lib.plan_scatter_a_i32(rows, _ptr(colors, ctypes.c_int32),
                           _ptr(out, ctypes.c_int32))
    return out


def plan_scatter_c(rows, R, dst, colors):
    lib = _plan_lib()
    dst = _c32(dst)
    out = np.empty(rows * 128, dtype=np.int32)
    cp = (_ptr(_c32(colors), ctypes.c_int32) if colors is not None
          else ctypes.cast(None, ctypes.POINTER(ctypes.c_int32)))
    lib.plan_scatter_c_i32(rows, R, _ptr(dst, ctypes.c_int32), cp,
                           _ptr(out, ctypes.c_int32))
    return out


def plan_scatter_b(rows, R, tileabs, dst, colors):
    lib = _plan_lib()
    dst = _c32(dst)
    out = np.empty(rows * 128, dtype=np.int32)
    cp = (_ptr(_c32(colors), ctypes.c_int32) if colors is not None
          else ctypes.cast(None, ctypes.POINTER(ctypes.c_int32)))
    lib.plan_scatter_b_i32(rows, R, int(tileabs),
                           _ptr(dst, ctypes.c_int32), cp,
                           _ptr(out, ctypes.c_int32))
    return out


def plan_t_next(rows, R, dst, colors):
    lib = _plan_lib()
    dst = _c32(dst)
    out = np.empty(rows * 128, dtype=np.int32)
    cp = (_ptr(_c32(colors), ctypes.c_int32) if colors is not None
          else ctypes.cast(None, ctypes.POINTER(ctypes.c_int32)))
    lib.plan_t_next_i32(rows, R, _ptr(dst, ctypes.c_int32), cp,
                        _ptr(out, ctypes.c_int32))
    return out


def plan_scatter_freelanes(rows, dst, colors):
    lib = _plan_lib()
    dst = _c32(dst)
    colors = _c32(colors)
    out = np.empty(rows * 128, dtype=np.int32)
    lib.plan_scatter_freelanes_i32(rows, _ptr(dst, ctypes.c_int32),
                                   _ptr(colors, ctypes.c_int32),
                                   _ptr(out, ctypes.c_int32))
    return out

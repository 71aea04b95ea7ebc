"""Host-side dissection of the SELLR plan for the bench's lognormal
matrix: which passes execute per matvec, each pass's grid bytes, where
the time should go.  No TPU needed (construction is host numpy)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from bench import _random_lognormal_csr
from vexcl_tpu.sparse.shuffle import SELLR

n = 1 << 20
ptr, col, val, nnz = _random_lognormal_csr(n)
print(f"n={n} nnz={nnz} mean_row={nnz/n:.1f}")
t0 = time.time()
A = SELLR(n, n, ptr, col, val)
print(f"construction {time.time()-t0:.1f}s")


def route_bytes(kinds, rows, label):
    total = 0
    for op in kinds:
        kind = op[0]
        if kind in ("lane", "sub", "subk", "lsl", "lslk",
                    "t", "lane_t"):
            b = rows * 128 * 4 * 2
            print(f"  {label}{kind:9s} rows={rows}  {b/1e6:.0f} MB")
        elif kind in ("tinv", "tinv_lane"):
            G, R = op[-2], op[-1]
            b = rows * 128 * 4 * 2
            rows = G * R
            print(f"  {label}{kind:9s} G={G} R={R}  {b/1e6:.0f} MB")
        elif kind == "t128":
            G, R = op[-2], op[-1]
            rows_new = G * 128
            b = (rows + rows_new) * 128 * 4
            print(f"  {label}t128      G={G} R={R} rows {rows}->{rows_new}"
                  f" (pad {128/R:.0f}x)  {b/1e6:.0f} MB")
            rows = rows_new
        elif kind == "t128inv":
            G, R = op[-2], op[-1]
            rows_new = G * R
            b = (rows + rows_new) * 128 * 4
            print(f"  {label}t128inv   G={G} R={R}  {b/1e6:.0f} MB")
            rows = rows_new
        total += b
    return total


print(f"src_rows={A._src_rows} dst_rows={A._dst_rows} R={A._R} "
      f"nchunks={A._nchunks} chunk_rows={A._chunk_rows}")
print(f"classes={len(A._classes)} slots={A._dst_rows*128/1e6:.1f}M "
      f"(nnz {nnz/1e6:.1f}M) route grid={A._R*128/1e6:.1f}M")
for off, nk, nkp, wk in A._classes[:8]:
    print(f"  class off={off} n_k={nk} (pad {nkp}) w_k={wk}")
if len(A._classes) > 8:
    print(f"  ... {len(A._classes)-8} more")
tb = route_bytes(A._stage_kinds, A._R, "")
print(f"route pass bytes total ~{tb/1e9:.2f} GB (per matvec, r+w)")
ex_b = (A._nchunks * A._chunk_rows * 128) * 4 * 2
print(f"expand: {A._nchunks}x{A._chunk_rows} rows ({ex_b/1e6:.0f} MB r+w)")
red_b = A._dst_rows * 128 * 4 * 2 + A.n * 4
print(f"reduce: {red_b/1e6:.0f} MB over {len(A._classes)} class planes")
if A._y_kinds is not None:
    yb = route_bytes(A._y_kinds, A._y_R, "y: ")
    print(f"y scatter route R={A._y_R}: ~{yb/1e6:.0f} MB")
xb = 0
if A._x_kinds is not None:
    xb = route_bytes(A._x_kinds, A._x_R, "x: ")
    ndup = 0 if A._dup_idx is None else A._dup_idx.shape[0]
    print(f"x balance pre-route R={A._x_R}: ~{xb/1e6:.0f} MB "
          f"(dups={ndup})")
if A._hot_W is not None:
    print(f"hot plane: {A._hot_W.shape}")
if A.tail is not None:
    print(f"CSR tail nnz={A.tail.nnz} (~{A.tail.nnz*15e-6:.2f} ms at "
          f"15 ns/entry)")
grand = tb + ex_b + red_b + (yb if A._y_kinds is not None else 0) + xb
print(f"TOTAL ~{grand/1e9:.2f} GB/matvec -> ~{grand/600e9*1e3:.2f} ms at "
      f"600 GB/s -> ~{2*nnz/(grand/600e9)/1e9:.1f} GFLOP/s byte-bound")

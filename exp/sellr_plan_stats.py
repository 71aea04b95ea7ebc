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

def describe(S, depth=0):
    pad = "  " * depth
    print(f"{pad}tier depth={depth}: n={S.n} w={S.width} src_rows={S._src_rows} "
          f"R={S._R} nchunks={S._nchunks} chunk_rows={S._chunk_rows}")
    ell_slots = S.n * S.width
    print(f"{pad}  ELL slots={ell_slots/1e6:.1f}M route grid={S._R*128/1e6:.1f}M")
    # reconstruct stage grid sizes by replaying shapes
    rows = S._R
    total_bytes = 0
    for op in S._stage_kinds:
        kind = op[0]
        if kind in ("lane", "sub", "lsl"):
            b = rows * 128 * 4 * 2  # r+w
            print(f"{pad}  {kind:5s} rows={rows}  {b/1e6:.0f} MB")
        elif kind in ("t", "lane_t"):
            G, R = op[1], op[2]
            b = rows * 128 * 4 * 2
            print(f"{pad}  {kind:5s} G={G} R={R}  {b/1e6:.0f} MB")
        elif kind in ("tinv", "tinv_lane"):
            G, R = op[1], op[2]
            rows_new = G * R
            b = rows * 128 * 4 * 2
            print(f"{pad}  {kind:9s} G={G} R={R}  {b/1e6:.0f} MB -> rows={rows_new}")
            rows = rows_new
        elif kind == "t128":
            G, R = op[1], op[2]
            rows_new = G * 128
            b = (rows + rows_new) * 128 * 4
            print(f"{pad}  t128  G={G} R={R}  rows {rows}->{rows_new} "
                  f"(pad {128/R:.0f}x)  {b/1e6:.0f} MB")
            rows = rows_new
        elif kind == "t128inv":
            G, R = op[1], op[2]
            rows_new = G * R
            b = (rows + rows_new) * 128 * 4
            print(f"{pad}  t128inv G={G} R={R} rows {rows}->{rows_new}  {b/1e6:.0f} MB")
            rows = rows_new
        total_bytes += b
    # the t/tinv intermediate rows bookkeeping above is approximate for 't'
    print(f"{pad}  route pass bytes total ~{total_bytes/1e9:.2f} GB "
          f"(per matvec, r+w)")
    ex_b = (S._nchunks * S._chunk_rows * 128) * 4 * 2
    print(f"{pad}  expand: {S._nchunks}x{S._chunk_rows} rows "
          f"({ex_b/1e6:.0f} MB r+w)")
    red_b = ell_slots * 4 * 2 + S.n * 4
    print(f"{pad}  reduce: {red_b/1e6:.0f} MB")
    if S._hot_W is not None:
        print(f"{pad}  hot plane: {S._hot_W.shape}")
    if S.tier is not None:
        print(f"{pad}  tier route R={S._tier_R} n_t={S._tier_n} "
              f"stages={[k[0] for k in S._tier_route]}")
        describe(S.tier, depth + 1)
    elif S.tail is not None:
        print(f"{pad}  CSR tail nnz={S.tail.nnz}")

describe(A)

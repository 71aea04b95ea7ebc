#!/usr/bin/env python
"""Complex-valued SpMV (reference: examples/complex_spmv.cpp).

The reference needs ~100 lines of trait specializations to teach its
codegen that std::complex maps to float2 with complex multiply semantics.
Here complex64 is a native dtype of the expression engine, so a
complex-valued matrix applied to a complex vector just works — with TRUE
complex multiplication (the thing the reference warns is wrong for plain
elementwise float2).

On the axon TPU platform complex arrays cross the host boundary as
(real, imag) pairs (vector.py shims); inside the compiled kernel they are
native complex64.
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import vexcl_tpu as vex  # noqa: E402


def main():
    ctx = vex.Context(vex.Filter.Env)
    print(ctx)

    n = 1024
    rng = np.random.default_rng(42)

    # tridiagonal complex matrix (a 1-D Helmholtz-like operator)
    rows, cols, vals = [], [], []
    k = 0.5 + 0.25j
    for i in range(n):
        for j, v in ((i - 1, -1.0 + 0j), (i, 2.0 + k), (i + 1, -1.0 + 0j)):
            if 0 <= j < n:
                rows.append(i)
                cols.append(j)
                vals.append(v)
    ptr = np.searchsorted(rows, np.arange(n + 1))
    A = vex.SpMat(n, n, ptr, np.array(cols), np.array(vals, np.complex64))

    x = vex.vector(
        data=(rng.random(n) + 1j * rng.random(n)).astype(np.complex64))
    y = vex.vector(n, dtype=np.complex64)
    y[:] = A * x

    # oracle
    import scipy.sparse as sp

    dens = sp.csr_matrix(
        (np.array(vals, np.complex64), (rows, cols)), shape=(n, n)
    ).toarray()
    err = np.abs(np.asarray(y) - dens @ np.asarray(x)).max()
    print(f"matrix format: {A.device.format}")
    print(f"max |err| vs host complex oracle: {err:.2e}")


if __name__ == "__main__":
    main()

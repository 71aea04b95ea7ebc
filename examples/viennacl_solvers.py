"""Iterative-solver interop (examples/viennacl/viennacl_solvers.cpp
analog): run CG and BiCGStab on vexcl_tpu containers — the on-device
solvers (interop.cg / interop.bicgstab, the ViennaCL-solvers-on-vex-types
analog) and scipy's CG through the LinearOperator shim."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import vexcl_tpu as vex
from vexcl_tpu.interop import as_linear_operator, bicgstab, cg


def poisson1d(n):
    ptr, col, val = [0], [], []
    for i in range(n):
        for j, v in ((i - 1, -1.0), (i, 2.05), (i + 1, -1.0)):
            if 0 <= j < n:
                col.append(j)
                val.append(v)
        ptr.append(len(col))
    return np.asarray(ptr), np.asarray(col, np.int32), np.asarray(val)


def main():
    ctx = vex.Context(vex.Filter.Env, set_current=True)
    print(ctx)
    n = 1 << 12
    ptr, col, val = poisson1d(n)
    A = vex.SpMat(n, n, ptr, col, val, fmt="csr", context=ctx)
    b = vex.vector(data=np.ones(n), context=ctx)

    x, iters = cg(A, b, tol=1e-10, maxiter=4 * n)
    r = np.ones(n) - np.asarray(vex.eval(A * x))
    print(f"device CG: {iters} iters, |r| = {np.linalg.norm(r):.2e}")

    import scipy.sparse.linalg as sla

    xs, info = sla.cg(as_linear_operator(A), np.ones(n), rtol=1e-10)
    print(f"scipy CG through LinearOperator: info={info}, "
          f"match={np.allclose(np.asarray(x), xs, atol=1e-5)}")

    # non-symmetric system -> BiCGStab (the second reference solver)
    ptr, col, val = poisson1d(n)
    val = np.asarray(val, np.float64)
    val[::3] *= 1.3  # break symmetry
    B = vex.SpMat(n, n, ptr, col, val, fmt="csr", context=ctx)
    xb, itb = bicgstab(B, b, tol=1e-12, maxiter=4 * n)
    rb = np.ones(n) - np.asarray(vex.eval(B * xb))
    print(f"device BiCGStab: {itb} iters, |r| = {np.linalg.norm(rb):.2e}")


if __name__ == "__main__":
    main()

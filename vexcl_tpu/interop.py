"""Interop with external array libraries and solvers.

Analog of vexcl/external/* (boost_compute.hpp, clogs.hpp — third-party
sort/scan delegation — and viennacl.hpp:34-90, which shims vex types into
ViennaCL's CG/BiCGStab solvers).

TPU-native equivalents:

* **numpy / dlpack / torch** — zero-copy-where-possible container exchange
  (the Boost.Compute "wrap existing buffer" use-case).
* **scipy solvers** — `as_linear_operator` exposes any vexcl_tpu sparse
  matrix to `scipy.sparse.linalg` iterative solvers (the ViennaCL
  use-case: run Krylov solvers over device-resident operators).
* **cg** — a native device-side conjugate-gradient built from library
  primitives, so the whole solve stays on TPU (what examples/devlist +
  viennacl interop demos achieve in the reference).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .vector import vector

__all__ = [
    "from_numpy",
    "to_numpy",
    "from_dlpack",
    "to_dlpack",
    "from_torch",
    "to_torch",
    "as_linear_operator",
    "cg",
    "bicgstab",
]


def from_numpy(arr: np.ndarray, *, context=None) -> vector:
    return vector(data=np.asarray(arr), context=context)


def to_numpy(vec: vector) -> np.ndarray:
    return vec.to_numpy()


def to_dlpack(vec: vector):
    return jax.dlpack.to_dlpack(vec.array) if hasattr(jax.dlpack, "to_dlpack") else vec.array.__dlpack__()


def from_dlpack(capsule, *, context=None) -> vector:
    arr = jax.dlpack.from_dlpack(capsule)
    return vector(data=arr, context=context)


def to_torch(vec: vector):
    """Device->host->torch (torch is CPU-only in this environment)."""
    import torch

    # np.array(...) copy: jax arrays export read-only host buffers, and
    # torch tensors must be writable
    return torch.from_numpy(np.array(vec.to_numpy()))


def from_torch(t, *, context=None) -> vector:
    import torch  # noqa: F401

    return vector(data=t.detach().cpu().numpy(), context=context)


def as_linear_operator(A):
    """Wrap a vexcl_tpu sparse matrix for scipy.sparse.linalg solvers
    (external/viennacl.hpp analog)."""
    from scipy.sparse.linalg import LinearOperator

    n, m = A.n, A.m
    dev = A.device if hasattr(A, "device") else A
    leaves = dev.leaves()
    jit_mv = jax.jit(lambda x, *lv: dev.apply_leaves(lv, x))

    def matvec(x):
        return np.asarray(jit_mv(jnp.asarray(x), *leaves))

    return LinearOperator((n, m), matvec=matvec, dtype=A.dtype)


def cg(
    A,
    b: vector,
    x0: Optional[vector] = None,
    tol: float = 1e-8,
    maxiter: Optional[int] = None,
) -> Tuple[vector, int]:
    """Conjugate gradients fully on device: the iteration is one jitted
    `lax.while_loop`, SpMV and reductions fused by XLA."""
    n = b.size
    maxiter = maxiter if maxiter is not None else 10 * n
    dev = A.device if hasattr(A, "device") else A
    leaves = dev.leaves()

    bb = b.array
    x_init = x0.array if x0 is not None else jnp.zeros_like(bb)

    # matrix planes travel as jit ARGUMENTS: closed-over arrays would be
    # embedded as program constants (huge executables; the axon tunnel
    # rejects oversized compile requests outright)
    @jax.jit
    def solve(b_arr, x_arr, *lv):
        def mv(x):
            return dev.apply_leaves(lv, x).astype(bb.dtype)

        r = b_arr - mv(x_arr)
        p = r
        rs = jnp.vdot(r, r)

        def cond(state):
            x, r, p, rs, it = state
            return (rs > tol * tol) & (it < maxiter)

        def body(state):
            x, r, p, rs, it = state
            Ap = mv(p)
            alpha = rs / jnp.vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.vdot(r, r)
            p = r + (rs_new / rs) * p
            return (x, r, p, rs_new, it + 1)

        x, r, p, rs, it = jax.lax.while_loop(
            cond, body, (x_arr, r, p, rs, jnp.int32(0))
        )
        return x, it

    x_arr, iters = solve(bb, x_init, *leaves)
    return vector(data=x_arr, context=b.context), int(iters)


def bicgstab(
    A,
    b: vector,
    x0: Optional[vector] = None,
    tol: float = 1e-8,
    maxiter: Optional[int] = None,
) -> Tuple[vector, int]:
    """BiCGStab fully on device (the second solver the reference runs on
    vex containers through ViennaCL, examples/viennacl/viennacl_solvers.cpp
    + external/viennacl.hpp:34-90): one jitted `lax.while_loop`, SpMV and
    reductions fused by XLA.  Works for non-symmetric systems where
    :func:`cg` does not apply."""
    n = b.size
    maxiter = maxiter if maxiter is not None else 10 * n
    dev = A.device if hasattr(A, "device") else A
    leaves = dev.leaves()

    bb = b.array
    x_init = x0.array if x0 is not None else jnp.zeros_like(bb)
    eps = jnp.finfo(bb.dtype).tiny if jnp.issubdtype(
        bb.dtype, jnp.floating) else 1e-300

    @jax.jit
    def solve(b_arr, x_arr, *lv):
        def mv(x):
            return dev.apply_leaves(lv, x).astype(bb.dtype)

        r = b_arr - mv(x_arr)
        rhat = r  # shadow residual, fixed
        rho = alpha = omega = jnp.ones((), bb.dtype)
        v = p = jnp.zeros_like(r)

        def cond(state):
            x, r, rho, alpha, omega, v, p, it = state
            return (jnp.vdot(r, r) > tol * tol) & (it < maxiter)

        def body(state):
            x, r, rho, alpha, omega, v, p, it = state
            rho_new = jnp.vdot(rhat, r)
            beta = (rho_new / (rho + eps)) * (alpha / (omega + eps))
            p = r + beta * (p - omega * v)
            v = mv(p)
            alpha = rho_new / (jnp.vdot(rhat, v) + eps)
            s = r - alpha * v
            t = mv(s)
            omega = jnp.vdot(t, s) / (jnp.vdot(t, t) + eps)
            x = x + alpha * p + omega * s
            r = s - omega * t
            return (x, r, rho_new, alpha, omega, v, p, it + 1)

        x, r, rho, alpha, omega, v, p, it = jax.lax.while_loop(
            cond, body, (x_arr, r, rho, alpha, omega, v, p, jnp.int32(0))
        )
        return x, it

    x_arr, iters = solve(bb, x_init, *leaves)
    return vector(data=x_arr, context=b.context), int(iters)

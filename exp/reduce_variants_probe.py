"""On-chip A/B of SELL-R reduce-stage variants at the bench matrix.

The shipped reduce (apply_leaves per-class multiply + sum(axis=0) over
transposed (wk, nkp) planes) measures 0.553 ms against a 0.19 ms byte
bound (docs/tpu_kernel_notes.md).  Variants:

  A  shipped: hf*vf multiply + per-class sum(axis=0)        (134 MB read)
  B  sum-only: per-class sum(axis=0) of hf alone — simulates folding the
     v multiply into the expand (v_src premultiplied through the route;
     permutation commutes with elementwise multiply)        (67 MB read)
  C  MXU ones-row matmul per class: ones(1,wk) @ plane      (67 MB read)
  D  Pallas per-class strided-sum kernel, (wk, W) blocks    (67 MB read)

Run on the real chip with NO env overrides.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

from bench import _random_lognormal_csr, slope_seconds
from vexcl_tpu.sparse.shuffle import SELLR
from vexcl_tpu.config import config

n = 1 << 20
ptr, col, val, nnz = _random_lognormal_csr(n)
t0 = time.time()
A = SELLR(n, n, ptr, col, val)
print(f"nnz={nnz} construction {time.time() - t0:.1f} s "
      f"classes={len(A._classes)} dst_rows={A._dst_rows}")
assert all(nkp > 0 for _, _, nkp, _ in A._classes)

interpret = config.pallas_interpret()
rng = np.random.default_rng(0)
M = A._dst_rows * 128
h = jnp.asarray(rng.standard_normal(M).astype(np.float32))
vf = A._val.reshape(-1)
x0 = jnp.asarray(rng.standard_normal(128).astype(np.float32))


def _pin(hf, v):
    # LICM pin: tie the streamed array to the chain carry so XLA cannot
    # hoist the whole reduce out of the fori_loop (sellr_tpu_stages.py)
    return hf + v[0] * np.float32(1e-30)


def reduce_A(hf, v):
    parts = []
    for off, nk, nkp, wk in A._classes:
        seg = hf[off: off + wk * nkp] * v[off: off + wk * nkp]
        parts.append(seg.reshape(wk, nkp).sum(axis=0))
    return jnp.concatenate(parts)


def reduce_B(hf):
    parts = []
    for off, nk, nkp, wk in A._classes:
        parts.append(hf[off: off + wk * nkp].reshape(wk, nkp).sum(axis=0))
    return jnp.concatenate(parts)


def reduce_C(hf):
    parts = []
    for off, nk, nkp, wk in A._classes:
        seg = hf[off: off + wk * nkp].reshape(wk, nkp)
        ones = jnp.ones((1, wk), seg.dtype)
        parts.append(
            jax.lax.dot_general(ones, seg, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST
                                ).reshape(-1))
    return jnp.concatenate(parts)


def _colsum_kernel(h_ref, o_ref):
    o_ref[:, :] = jnp.sum(h_ref[:, :], axis=0, keepdims=True)


def _class_colsum(seg2d, wk, nkp):
    # W: widest 128-multiple block dividing nkp (grid-step overhead is
    # ~0.2 us; W=4096 keeps the step count ~Ny/4096)
    tiles = nkp // 128
    for T in (32, 16, 8, 4, 2, 1):
        if tiles % T == 0:
            break
    W = 128 * T
    return pl.pallas_call(
        _colsum_kernel,
        grid=(nkp // W,),
        in_specs=[pl.BlockSpec((wk, W), lambda b: (0, b))],
        out_specs=pl.BlockSpec((1, W), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((1, nkp), seg2d.dtype),
        interpret=interpret,
    )(seg2d).reshape(-1)


def reduce_D(hf):
    parts = []
    for off, nk, nkp, wk in A._classes:
        seg = hf[off: off + wk * nkp].reshape(wk, nkp)
        if wk == 1:
            parts.append(seg.reshape(-1))
        else:
            parts.append(_class_colsum(seg, wk, nkp))
    return jnp.concatenate(parts)


# ---- numerics cross-check ------------------------------------------------
ref = jax.jit(reduce_B)(h)
for name, fn in (("C", reduce_C), ("D", reduce_D)):
    got = jax.jit(fn)(h)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    print(f"variant {name} max rel err vs B: {err:.2e}")
    assert err < 1e-5, (name, err)

# ---- timing --------------------------------------------------------------
Ny = sum(nkp for _, _, nkp, _ in A._classes)
print(f"Ny={Ny} slots={M} "
      f"(one-array bound ~{(M * 4 + Ny * 4) / 700e9 * 1e3:.3f} ms at 700 GB/s)")


def run(name, step, nbytes, **kw):
    t = slope_seconds(step, x0, **kw)
    print(f"{name:28s} {t * 1e3:8.3f} ms   {nbytes / t / 1e9:6.0f} GB/s")
    return t


bA = 2 * M * 4 + Ny * 4
b1 = M * 4 + Ny * 4

run("A shipped mul+sum", lambda v, hc, vv: (
    v * np.float32(0.999)
    + reduce_A(_pin(hc, v), vv).sum() * np.float32(1e-9)) % 1.0,
    bA, lo=32, hi=288, extra=(h, vf))

run("B sum-only (premul sim)", lambda v, hc: (
    v * np.float32(0.999)
    + reduce_B(_pin(hc, v)).sum() * np.float32(1e-9)) % 1.0,
    b1, lo=32, hi=288, extra=(h,))

run("C MXU ones-matmul", lambda v, hc: (
    v * np.float32(0.999)
    + reduce_C(_pin(hc, v)).sum() * np.float32(1e-9)) % 1.0,
    b1, lo=32, hi=288, extra=(h,))

run("D pallas class colsum", lambda v, hc: (
    v * np.float32(0.999)
    + reduce_D(_pin(hc, v)).sum() * np.float32(1e-9)) % 1.0,
    b1, lo=32, hi=288, extra=(h,))

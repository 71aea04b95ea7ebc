"""Flat-cube CT variant: contract successive axes of the (r1, ..., rk)
cube with per-stage codelet einsums + in-trace twiddles, ONE final
reversal transpose — vs the production recursive form, which pays a
materialized swapaxes pass at every recursion pop.

Hypothesis for the 2^24 cliff (708 GFLOP/s @2^22 -> ~190-320 @2^24):
the per-level (..., m, r)->(..., r, m) swapaxes passes hit a strided-HBM
cliff at large m.  The flat form replaces k-1 transpose passes with one
axis-reversal at the end, and leaves intermediate layout choices to XLA
(dot_general contracts ANY axis without an explicit transpose op).

Math (LSD-first mixed radix, n = r*s*t, x[j1,j2,j3], j = j1*st + j2*t + j3):
  stage1: A[k1,j2,j3] = sum_j1 x  * W_r^{j1 k1};  twiddle W_n^{k1*(j2*t+j3)}
  stage2: B[k1,k2,j3] = sum_j2 A' * W_s^{j2 k2};  twiddle W_{st}^{k2*j3}
  stage3: C[k1,k2,k3] = sum_j3 B' * W_t^{j3 k3}
  X[k1 + r*k2 + r*s*k3] = C[k1,k2,k3]  ->  C.transpose(reversed).ravel()

Usage: numerics on CPU (JAX_PLATFORMS=cpu python exp/fft_flat.py);
perf A/B on the real chip (python exp/fft_flat.py perf).
"""

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "perf" not in sys.argv[1:]:
    # numerics mode runs on CPU; the env var is ignored (sitecustomize
    # force-registers the axon TPU platform) — set the config directly
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

F = importlib.import_module("vexcl_tpu.ops.fft")


def _twiddle_axis(ri, rest, sign, dtype):
    """W_{ri*rest}^{k_i * jrest} as (ri, rest) planes, iota-built."""
    k = jax.lax.broadcasted_iota(jnp.int32, (ri, rest), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (ri, rest), 1)
    frac = (k * j).astype(dtype) * (1.0 / (ri * rest))
    c, s = F._sincos_2pi(frac)
    return c, (s if sign > 0 else -s)


def fft_flat(xr, xi, sign, plan):
    """FFT along the last axis via flat-cube staging; supports leading
    batch axes like _fft_planar."""
    n = xr.shape[-1]
    batch = xr.shape[:-1]
    k = len(plan)
    if k == 1:
        cr, ci = F._codelet_planar_np(n, sign, str(np.dtype(xr.dtype)))
        return F._cmatmul_last(xr, xi, jnp.asarray(cr), jnp.asarray(ci))
    cube = batch + tuple(plan)
    xr = xr.reshape(cube)
    xi = xi.reshape(cube)
    alg = F._dot_alg(xr.dtype)
    nb = len(batch)
    rest = n
    for i, r in enumerate(plan):
        rest //= r
        cr, ci = F._codelet_planar_np(r, sign, str(np.dtype(xr.dtype)))
        cr = jnp.asarray(cr)
        ci = jnp.asarray(ci)
        wa = jnp.concatenate([cr, ci], axis=0)   # (2r, r)
        wb = jnp.concatenate([-ci, cr], axis=0)  # (2r, r)
        # contract cube axis nb+i (size r) against the codelet
        dn = (((nb + i,), (1,)), ((), ()))
        y2 = (jax.lax.dot_general(xr, wa, dn, precision=alg)
              + jax.lax.dot_general(xi, wb, dn, precision=alg))
        # dot_general moves the contracted axis's result to the LAST
        # position; put it back at nb+i
        y2 = jnp.moveaxis(y2, -1, nb + i)
        idx_r = [slice(None)] * y2.ndim
        idx_i = [slice(None)] * y2.ndim
        idx_r[nb + i] = slice(0, r)
        idx_i[nb + i] = slice(r, 2 * r)
        xr, xi = y2[tuple(idx_r)], y2[tuple(idx_i)]
        if rest > 1:
            tc, ts = _twiddle_axis(r, rest, sign, xr.dtype)
            shape = (1,) * (nb + i) + (r,) + tuple(plan[i + 1:])
            tc = tc.reshape(shape)
            ts = ts.reshape(shape)
            xr, xi = xr * tc - xi * ts, xr * ts + xi * tc
    # output digit order is reversed: transpose the plan axes
    perm = tuple(range(nb)) + tuple(nb + k - 1 - i for i in range(k))
    out = batch + (n,)
    return (jnp.transpose(xr, perm).reshape(out),
            jnp.transpose(xi, perm).reshape(out))


def check():
    rng = np.random.default_rng(0)
    for n, maxc in ((1 << 12, 64), (1 << 12, 256), (1 << 10, 32),
                    (60 * 64, 64)):
        plan = F._radix_plan(n, maxc)
        x = (rng.random(n) + 1j * rng.random(n)).astype(np.complex64)
        xr = jnp.asarray(x.real)
        xi = jnp.asarray(x.imag)
        yr, yi = jax.jit(lambda a, b: fft_flat(a, b, -1.0, plan))(xr, xi)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft(x.astype(np.complex128))
        err = np.abs(got - ref).max() / np.abs(ref).max()
        print(f"n={n} plan={plan} rel_err={err:.2e}")
        assert err < 5e-7, err
    # batched
    x = (rng.random((4, 1 << 10)) + 1j * rng.random((4, 1 << 10))).astype(np.complex64)
    plan = F._radix_plan(1 << 10, 256)
    yr, yi = fft_flat(jnp.asarray(x.real), jnp.asarray(x.imag), -1.0, plan)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    err = np.abs((np.asarray(yr) + 1j * np.asarray(yi)) - ref).max() / np.abs(ref).max()
    print(f"batched rel_err={err:.2e}")
    assert err < 5e-7
    print("numerics OK")


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    while getattr(leaf, "ndim", 0) > 0:
        leaf = leaf[0]
    return float(leaf)


def slope(step, args, lo=2, hi=8, reps=5):
    def make(inner):
        @jax.jit
        def run(*a):
            return jax.lax.fori_loop(0, inner, lambda i, a: step(*a), a)
        return run
    runs = {kk: make(kk) for kk in (lo, hi)}
    for kk in (lo, hi):
        _fetch(runs[kk](*args))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter(); _fetch(runs[lo](*args)); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); _fetch(runs[hi](*args)); th = time.perf_counter() - t0
        slopes.append((th - tl) / (hi - lo))
    return sorted(slopes)[len(slopes) // 2]


def perf():
    print("device:", jax.devices()[0].device_kind)
    key = jax.random.PRNGKey(0)
    for logn in (20, 22, 24):
        n = 1 << logn
        plan = F._radix_plan(n, F._MAX_CODELET)
        xr = jax.random.normal(key, (n,), jnp.float32)
        xi = jax.random.normal(key, (n,), jnp.float32)
        flops = 5.0 * n * logn
        for name, fn in (
            ("recursive", lambda a, b: F._fft_planar(a, b, -1.0, plan)),
            ("flat", lambda a, b: F._fft_planar_flat(a, b, -1.0, plan)),
            ("recursive2", lambda a, b: F._fft_planar(a, b, -1.0, plan)),
            ("flat2", lambda a, b: F._fft_planar_flat(a, b, -1.0, plan)),
        ):
            s = slope(fn, (xr, xi))
            print(f"2^{logn} {name:11s} plan={plan} {s*1e3:8.2f} ms "
                  f"{flops/s/1e9:8.1f} GFLOP/s")
            sys.stdout.flush()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "perf":
        perf()
    else:
        check()

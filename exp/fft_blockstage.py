"""Halve the per-stage HBM traffic of the ct engine (r2 follow-up).

exp/fft_stagebreak showed the stages themselves are bandwidth-bound:
_cmatmul_radix concatenates the planes along the minor axis and runs TWO
einsums over the stacked data (a = wr@x2, b = wi@x2) — every stage reads
the full working set twice plus a concat pass.  Variants (same recursion,
same twiddles/unscramble), interleaved at 2^22/2^24:

  current   — minor-axis stack, two einsums (shipping code)
  blockcat  — contraction-axis stack, ONE einsum with the 2r x 2r block
              matrix [[wr, -wi], [wi, wr]]
  blockacc  — NO concat: y2 = [[wr],[wi]] @ xr + [[-wi],[wr]] @ xi,
              two (2r, r) matmuls accumulated
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

F = importlib.import_module("vexcl_tpu.ops.fft")


def make_engine(cmat):
    def go(xr, xi, sign, plan):
        n = xr.shape[-1]
        rt = str(np.dtype(xr.dtype))
        if len(plan) == 1:
            cr, ci = F._codelet_planar_np(n, sign, rt)
            return F._cmatmul_last(xr, xi, jnp.asarray(cr), jnp.asarray(ci))
        r = plan[0]
        m = n // r
        batch = xr.shape[:-1]
        cr, ci = F._codelet_planar_np(r, sign, rt)
        ar, ai = cmat(cr, ci, xr.reshape(batch + (r, m)),
                      xi.reshape(batch + (r, m)))
        tr, ti = F._twiddle_planar(r, m, sign, xr.dtype)
        br = ar * tr - ai * ti
        bi = ar * ti + ai * tr
        br, bi = go(br, bi, sign, plan[1:])
        return (jnp.swapaxes(br, -1, -2).reshape(batch + (n,)),
                jnp.swapaxes(bi, -1, -2).reshape(batch + (n,)))

    return go


def cmat_current(cr, ci, xr, xi):
    return F._cmatmul_radix(jnp.asarray(cr), jnp.asarray(ci), xr, xi)


def cmat_blockcat(cr, ci, xr, xi):
    alg = F._dot_alg()
    r = cr.shape[0]
    w2 = jnp.asarray(np.block([[cr, -ci], [ci, cr]]))
    x2 = jnp.concatenate([xr, xi], axis=-2)           # (..., 2r, m)
    y2 = jnp.einsum("ij,...jm->...im", w2, x2, precision=alg)
    return y2[..., :r, :], y2[..., r:, :]


def cmat_blockacc(cr, ci, xr, xi):
    alg = F._dot_alg()
    r = cr.shape[0]
    wa = jnp.asarray(np.concatenate([cr, ci], axis=0))    # (2r, r)
    wb = jnp.asarray(np.concatenate([-ci, cr], axis=0))   # (2r, r)
    y2 = (jnp.einsum("ij,...jm->...im", wa, xr, precision=alg)
          + jnp.einsum("ij,...jm->...im", wb, xi, precision=alg))
    return y2[..., :r, :], y2[..., r:, :]


def main():
    rng = np.random.default_rng(0)
    for logn in (22, 24):
        n = 1 << logn
        plan = F._radix_plan(n, 256)
        gf = 5 * n * np.log2(n) / 1e9
        hx = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64)
        ref_abs = np.abs(np.fft.fft(hx))
        nref = np.linalg.norm(ref_abs)
        x0 = jnp.asarray(hx.real.copy())
        y0 = jnp.asarray(hx.imag.copy())
        print(f"-- n = 2^{logn}  plan {plan} --", flush=True)
        for tag, cmat in (("current", cmat_current),
                          ("blockcat", cmat_blockcat),
                          ("blockacc", cmat_blockacc)):
            go = make_engine(cmat)
            outr, outi = jax.jit(
                lambda a, b: go(a, b, -1.0, plan))(x0, y0)
            got = np.asarray(jax.jit(
                lambda a, b: jnp.sqrt(a * a + b * b))(outr, outi))
            err = np.linalg.norm(got - ref_abs) / nref

            def step(pair, go=go):
                r, i = go(pair[0], pair[1], -1.0, plan)
                return (r * 1e-7, i * 1e-7)

            t = slope_seconds(step, (x0, y0), lo=4, hi=28)
            print(f"  {tag:9s} {t*1e3:7.3f} ms  {gf/t:6.1f} GF/s "
                  f"err~{err:.2e}", flush=True)


if __name__ == "__main__":
    main()

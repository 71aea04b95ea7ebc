"""Where does the ct engine's time go at large n?  (r2 follow-up)

At 2^20 the 3-stage plan achieves ~316 GB/s effective; at 2^24 only
~120 GB/s with the same stage count.  Variants, interleaved in one
process at 2^22 and 2^24 (plan = radix-256 3-stage):

  full        — the real engine (_fft_planar)
  noperm      — stages + twiddles, WITHOUT the per-level unscramble
                swapaxes (wrong output order, right compute)
  notwiddle   — stages only, twiddle multiplies skipped (wrong values)
  permonly    — a single materialized 3-D digit-reversal transpose of
                the planar pair (the layout cost floor)
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


def planar_variant(plan, sign, perm=True, twiddle=True):
    def go(xr, xi, plan):
        n = xr.shape[-1]
        if len(plan) == 1:
            cr, ci = F._codelet_planar_np(n, sign, str(np.dtype(xr.dtype)))
            return F._cmatmul_last(xr, xi, jnp.asarray(cr), jnp.asarray(ci))
        r = plan[0]
        m = n // r
        batch = xr.shape[:-1]
        cr, ci = F._codelet_planar_np(r, sign, str(np.dtype(xr.dtype)))
        ar, ai = F._cmatmul_radix(
            jnp.asarray(cr), jnp.asarray(ci),
            xr.reshape(batch + (r, m)), xi.reshape(batch + (r, m)))
        if twiddle:
            tr, ti = F._twiddle_planar(r, m, sign, xr.dtype)
            br = ar * tr - ai * ti
            bi = ar * ti + ai * tr
        else:
            br, bi = ar, ai
        br, bi = go(br, bi, plan[1:])
        if perm:
            return (jnp.swapaxes(br, -1, -2).reshape(batch + (n,)),
                    jnp.swapaxes(bi, -1, -2).reshape(batch + (n,)))
        return br.reshape(batch + (n,)), bi.reshape(batch + (n,))

    return go


def main():
    rng = np.random.default_rng(0)
    for logn in (22, 24):
        n = 1 << logn
        plan = F._radix_plan(n, 256)
        gf = 5 * n * np.log2(n) / 1e9
        hr = rng.standard_normal(n).astype(np.float32)
        hi = rng.standard_normal(n).astype(np.float32)
        x0 = jnp.asarray(hr)
        y0 = jnp.asarray(hi)
        print(f"-- n = 2^{logn}  plan {plan} --", flush=True)

        def chain(fn):
            # planar chain: feed (r, i) -> (r', i'); bound with cheap mult
            def step(pair):
                r, i = fn(pair[0], pair[1])
                return (r * 1e-7, i * 1e-7)
            t = slope_seconds(lambda p: step(p), (x0, y0), lo=4, hi=28)
            return t

        for tag, kw in (("full", dict()),
                        ("noperm", dict(perm=False)),
                        ("notwiddle", dict(perm=False, twiddle=False))):
            go = planar_variant(plan, -1.0, **kw)
            fn = lambda r, i: go(r, i, plan)
            t = chain(fn)
            print(f"  {tag:10s} {t*1e3:7.3f} ms  ({gf/t:6.1f} GF/s-equiv)",
                  flush=True)

        # layout floor: one digit-reversal transpose of both planes
        shape = tuple(plan)
        def permonly(r, i):
            rr = r.reshape(shape).transpose(tuple(range(len(shape)-1, -1, -1))).reshape(n)
            ii = i.reshape(shape).transpose(tuple(range(len(shape)-1, -1, -1))).reshape(n)
            return rr, ii
        t = chain(permonly)
        print(f"  permonly   {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

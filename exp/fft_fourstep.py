"""A/B: four-step large FFT vs direct XLA vs the own CT engine.

Hypothesis (r3): the own engine is 5-25% behind XLA at >=2^21
(kernel notes "FFT stage count"), but XLA's *batched* moderate-size
FFTs run 752-959 GFLOP/s (notes "Batched small FFTs") — far above the
429 a direct 2^24 measures.  The classic four-step factorization
N = n1*n2 turns one large transform into two batched moderate passes
plus one twiddle pass and transposes:

    A[j1, j2] = x[n2*j1 + j2]
    B[j2, k1] = FFT_{n1} over j1          (batched: n2 transforms)
    C[j2, k1] = B * W_N^{k1*j2}           (twiddle, fuses into copies)
    D[k1, k2] = FFT_{n2} over j2          (batched: n1 transforms)
    X[k1 + n1*k2] = D[k1, k2]             (one transpose readout)

Variants measured interleaved IN ONE PROCESS (cross-process swings
+-30%):  xla   — jnp.fft.fft direct (the current >=2^21 route)
         fs-x  — four-step with XLA batched sub-FFTs
         fs-ct — four-step with the own engine's batched sub-FFTs
         ct    — the own recursive CT planner (radix-256 plan)

Chain lengths follow the SNR rule (differential >> +-20 ms RTT).
Run on the real chip: python exp/fft_fourstep.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds


def gflops(n, t):
    return 5.0 * n * np.log2(n) / t / 1e9


def _twiddle(n1, n2, sign):
    """W_N^{k1*j2} planes, shape (n2, n1) [j2, k1] — in-trace iota so no
    host constant is embedded (ops/fft._twiddle_planar rationale)."""
    from vexcl_tpu.ops.fft import _sincos_2pi

    j2 = jax.lax.broadcasted_iota(jnp.int32, (n2, n1), 0)
    k1 = jax.lax.broadcasted_iota(jnp.int32, (n2, n1), 1)
    frac = (j2 * k1).astype(jnp.float32) * (1.0 / (n1 * n2))
    c, s = _sincos_2pi(frac)
    return c, (s if sign > 0 else -s)


def fourstep(z, n1, n2, sign, sub):
    """sub(z2d, sign) -> batched FFT along the LAST axis."""
    a = z.reshape(n1, n2)
    b = sub(a.T, sign)                      # (n2, n1) = [j2, k1]
    tc, ts = _twiddle(n1, n2, sign)
    tw = jax.lax.complex(tc, ts)
    c = b * tw
    d = sub(c.T, sign)                      # (n1, n2) = [k1, k2]
    return d.T.reshape(-1)                  # X[k1 + n1*k2]


def main():
    from vexcl_tpu.ops.fft import _fft_1d

    def sub_xla(a, sign):
        return jnp.fft.fft(a, axis=-1) if sign < 0 else jnp.fft.ifft(a, axis=-1) * a.shape[-1]

    def sub_ct(a, sign):
        return _fft_1d(a, sign)

    # correctness at a small size first
    rng = np.random.default_rng(0)
    zs = (rng.standard_normal(1 << 12) + 1j * rng.standard_normal(1 << 12)).astype(np.complex64)
    ref = np.fft.fft(zs)
    for name, sub in (("fs-x", sub_xla), ("fs-ct", sub_ct)):
        # split-complex fetch: complex host<->device is UNIMPLEMENTED on axon
        gr, gi = jax.jit(
            lambda r, i: (lambda y: (jnp.real(y), jnp.imag(y)))(
                fourstep(jax.lax.complex(r, i), 64, 64, -1.0, sub))
        )(jnp.asarray(zs.real), jnp.asarray(zs.imag))
        got = np.asarray(gr) + 1j * np.asarray(gi)
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        print(f"{name} 2^12 rel err {rel:.2e}")

    for logn, n1, lo, hi in ((21, 2048, 64, 576),
                             (22, 2048, 32, 288),
                             (23, 4096, 16, 144),
                             (24, 4096, 16, 144)):
        n = 1 << logn
        n2 = n // n1
        hr = rng.standard_normal(n).astype(np.float32)
        hi_im = rng.standard_normal(n).astype(np.float32)
        x0 = jnp.asarray(hr)
        xi0 = jnp.asarray(hi_im)
        inv_n = 1.0 / n

        def mk(fn):
            def link(r, i):
                y = fn(jax.lax.complex(r, i))
                return jnp.real(y) * inv_n
            return link

        variants = {
            "xla  ": mk(lambda z: jnp.fft.fft(z)),
            "fs-x ": mk(lambda z: fourstep(z, n1, n2, -1.0, sub_xla)),
            "fs-ct": mk(lambda z: fourstep(z, n1, n2, -1.0, sub_ct)),
            "ct   ": mk(lambda z: _fft_1d(z, -1.0)),
        }
        print(f"n=2^{logn} (n1={n1} n2={n2}) chains lo={lo} hi={hi}")
        for name, link in variants.items():
            t = slope_seconds(link, x0, lo=lo, hi=hi, extra=(xi0,))
            print(f"  {name}: {t*1e3:8.3f} ms  {gflops(n, t):7.1f} GFLOP/s",
                  flush=True)


if __name__ == "__main__":
    main()

"""A/B: batched small FFTs (4096 x 1024 c64, transform on the last
axis) — own CT engine (stage matmuls batch across transforms on the
MXU) vs the XLA FFT HLO.  VERDICT r2 missing #3: single 2^10 transforms
are latency-bound (15.9 GFLOP/s); the realistic small-FFT workload is
batched.  Also sweeps 2^8 and 2^12 to place the route window.

CHAIN-LENGTH WARNING (r3, now fixed): the first run of this probe used
lo=4/hi=16 — a ~3 ms differential under the +-20 ms tunnel RTT noise —
and produced garbage (apparent ct wins at 2^12/2^16 that vanished at
lo=64/hi=576, plus 3e8-"GFLOP/s" slopes).  The routing decision rests
on the long-chain sweep recorded in kernel notes "Batched small FFTs".

Run on the real chip: python exp/fft_batched_ab.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds


def gflops(batch, n, t):
    return 5.0 * batch * n * np.log2(n) / t / 1e9


def main():
    from vexcl_tpu.ops.fft import _fft_1d

    for logn, batch in ((8, 16384), (10, 4096), (12, 1024)):
        n = 1 << logn
        rng = np.random.default_rng(0)
        hr = rng.standard_normal((batch, n)).astype(np.float32)
        hi = rng.standard_normal((batch, n)).astype(np.float32)
        x0 = jnp.asarray(hr)
        xi0 = jnp.asarray(hi)

        def step_ct(r, i):
            z = jax.lax.complex(r, i)
            y = _fft_1d(z, -1.0)
            return jnp.real(y) * (1.0 / n), jnp.imag(y) * (1.0 / n)

        def step_xla(r, i):
            z = jax.lax.complex(r, i)
            y = jnp.fft.fft(z, axis=-1)
            return jnp.real(y) * (1.0 / n), jnp.imag(y) * (1.0 / n)

        # correctness once
        yc = jax.jit(lambda r, i: step_ct(r, i))(x0, xi0)
        yx = jax.jit(lambda r, i: step_xla(r, i))(x0, xi0)
        err = float(jnp.max(jnp.abs(yc[0] - yx[0])))
        print(f"n=2^{logn} batch={batch}: ct-vs-xla max err {err:.2e}")

        # wrap as single-array chains: keep r as the chained value,
        # i fixed as extra
        def ct_link(r, i):
            rr, ii = step_ct(r, i)
            return rr

        def xla_link(r, i):
            rr, ii = step_xla(r, i)
            return rr

        t_ct = slope_seconds(ct_link, x0, lo=64, hi=576, extra=(xi0,))
        t_x = slope_seconds(xla_link, x0, lo=64, hi=576, extra=(xi0,))
        print(f"  ct : {t_ct*1e3:.3f} ms  {gflops(batch, n, t_ct):.1f} GFLOP/s")
        print(f"  xla: {t_x*1e3:.3f} ms  {gflops(batch, n, t_x):.1f} GFLOP/s")


if __name__ == "__main__":
    main()

"""Pallas FFT interior-axis stage probe (r3, step 2).

Measures the building blocks of a flat-cube Pallas FFT engine at
radix 128 on 2^24:

  * interior stage: x viewed (pre, r, post), contract the MIDDLE axis
    per (1, r, 128) tile, twiddle W_{r*post}^{k*j} from in-register
    iota sincos, one read + one write;
  * manual X6 accuracy: w split 3-way into exactly-summing bf16 pieces
    (host-side), x split 2-way in-kernel -> 6 bf16 MXU passes, target
    ~1e-7 rel err (Mosaic's Precision.HIGHEST measured only 1.9e-5 in
    exp/fft_pallas_stage.py);
  * last stage: (rows, r) @ (r, 2r) tiles, no twiddle;
  * the final axis-reversal transpose (XLA) at cube (128,128,128,8).

Run: python exp/fft_pallas_stage2.py
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds
from vexcl_tpu.config import config
from vexcl_tpu.ops.fft import _codelet_planar_np, _sincos_2pi

LANE = 128
R = 128
PRE = 128
POST = 1 << 17 // 1  # pre*r*post = 2^24 -> post = 2^24/(128*128) = 1024
POST = (1 << 24) // (PRE * R)


def _split3(w):
    """Three bf16 pieces summing exactly to f32 w (8+8+8 mantissa)."""
    w = np.asarray(w, np.float32)
    h0 = w.astype(jnp.bfloat16)
    r0 = w - np.asarray(h0, np.float32)
    h1 = r0.astype(jnp.bfloat16)
    r1 = r0 - np.asarray(h1, np.float32)
    h2 = r1.astype(jnp.bfloat16)
    return h0, h1, h2


def _x6_dot(w3, x):
    """w @ x, both split 3-way into exactly-summing bf16 pieces, keeping
    the SIX products with i+j <= 2 (the dropped ones contribute <=
    ~2^-24 relative) — the triangular manual X6: measured 1.32e-7 rel
    err, matching XLA's BF16_BF16_F32_X6 (1.39e-7), where a 2-way x
    split gave only 2.6e-6."""
    x0 = x.astype(jnp.bfloat16)
    r0 = x - x0.astype(jnp.float32)
    x1 = r0.astype(jnp.bfloat16)
    x2 = (r0 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    xs = (x0, x1, x2)
    acc = None
    for i, wp in enumerate(w3):
        for j in range(3 - i):
            t = jnp.dot(wp, xs[j], preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc


def _mid_kernel(wa3a, wa3b, wa3c, wb3a, wb3b, wb3c, xr_ref, xi_ref,
                or_ref, oi_ref, *, sign, post, r):
    import jax.experimental.pallas as pl

    p = pl.program_id(0)  # noqa: F841 (pre index via block map)
    j = pl.program_id(1)
    xr = xr_ref[0]                      # (r, LANE)
    xi = xi_ref[0]
    y2 = (_x6_dot((wa3a[...], wa3b[...], wa3c[...]), xr)
          + _x6_dot((wb3a[...], wb3b[...], wb3c[...]), xi))
    ar, ai = y2[:r, :], y2[r:, :]
    k1 = jax.lax.broadcasted_iota(jnp.int32, (r, LANE), 0).astype(jnp.float32)
    jj = (j * LANE + jax.lax.broadcasted_iota(jnp.int32, (r, LANE), 1)
          ).astype(jnp.float32)
    frac = (k1 * jj) * np.float32(1.0 / (r * post))
    tr, ti = _sincos_2pi(frac)
    if sign < 0:
        ti = -ti
    or_ref[0] = ar * tr - ai * ti
    oi_ref[0] = ar * ti + ai * tr


def mid_stage(xr, xi, w3s, sign, pre, r, post):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (pre, post // LANE)
    spec_x = pl.BlockSpec((1, r, LANE), lambda p, j: (p, 0, j),
                          memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((2 * r, r), lambda p, j: (0, 0),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_mid_kernel, sign=sign, post=post, r=r),
        grid=grid,
        in_specs=[spec_w] * 6 + [spec_x] * 2,
        out_specs=[spec_x] * 2,
        out_shape=[jax.ShapeDtypeStruct((pre, r, post), jnp.float32)] * 2,
        interpret=config.pallas_interpret(),
    )(*w3s, xr.reshape(pre, r, post), xi.reshape(pre, r, post))
    return outs


def main():
    rng = np.random.default_rng(0)
    n = PRE * R * POST
    xr0 = jnp.asarray(rng.standard_normal((PRE, R, POST)).astype(np.float32))
    xi0 = jnp.asarray(rng.standard_normal((PRE, R, POST)).astype(np.float32))
    cr, ci = _codelet_planar_np(R, -1.0, "float32")
    wa = np.concatenate([cr, ci], axis=0)
    wb = np.concatenate([-ci, cr], axis=0)
    w3s = [jnp.asarray(p) for p in (*_split3(wa), *_split3(wb))]

    # accuracy vs f64 oracle on a small slice
    sl = 4
    ar = np.einsum("ij,pjm->pim", wa.astype(np.float64),
                   np.asarray(xr0[:sl], np.float64))
    ai = np.einsum("ij,pjm->pim", wb.astype(np.float64),
                   np.asarray(xi0[:sl], np.float64))
    y2_ref = ar + ai
    arr, aii = y2_ref[:, :R], y2_ref[:, R:]
    k1 = np.arange(R)[:, None]
    jj = np.arange(POST)[None, :]
    ph = -2 * np.pi * (k1 * jj) / (R * POST)
    tr, ti = np.cos(ph), np.sin(ph)
    br_ref = arr * tr - aii * ti
    bi_ref = arr * ti + aii * tr

    br, bi = jax.jit(
        lambda a, b: mid_stage(a, b, w3s, -1.0, PRE, R, POST))(xr0, xi0)
    scale = np.abs(br_ref).max()
    err = np.abs(np.asarray(br[:sl], np.float64) - br_ref).max() / scale
    print(f"mid-stage X6 rel err vs f64: {err:.2e} (scale {scale:.1f})")

    # stage timing
    def link(r_, i_):
        a, b = mid_stage(r_, i_, w3s, -1.0, PRE, R, POST)
        return a * 1e-3

    gb = 2 * 2 * n * 4 / 1e9
    t = slope_seconds(link, xr0, lo=32, hi=288, extra=(xi0,))
    print(f"mid stage r={R}: {t*1e3:.3f} ms  {gb/t:.0f} GB/s effective")

    # final axis-reversal transpose cost at the full cube
    cube = (128, 128, 128, 8)
    xr4 = xr0.reshape(cube)

    @jax.jit
    def tp(a):
        return jnp.transpose(a, (3, 2, 1, 0)).reshape(-1) * 1e-3

    def tlink(v):
        return tp(v.reshape(cube)).reshape(v.shape) + v * 0

    t2 = slope_seconds(tlink, xr0, lo=32, hi=288)
    print(f"axis-reversal transpose (1 plane): {t2*1e3:.3f} ms "
          f"({2 * n * 4 / 1e9 / t2:.0f} GB/s)")


if __name__ == "__main__":
    main()

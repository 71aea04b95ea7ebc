"""Pallas fused FFT stage probe (r3): can one Pallas pass — codelet
matmul + in-tile twiddle — beat the XLA stage (einsum + materialized
twiddle planes) at 2^24?

Stage form (level 0 of a (256,256,256) cube): X planar (256, 65536),
contract the radix axis on the left, then scale by W_n^{k1*j2}:

    XLA:    y2 = wa@xr + wb@xi  (one-pass accumulated form), then
            tr,ti = sincos planes (full-size, in-trace), 4-op twiddle
    Pallas: per (256, 128) tile: y2_tile = wa@xr_t + wb@xi_t on the MXU,
            twiddle factors from iota + sincos IN REGISTERS (the
            k1*j2 product is <= 2^24, f32-exact), one write.

Traffic/stage: XLA ~670 MB (einsum r/w + twiddle r/w), Pallas 268 MB.

Run: python exp/fft_pallas_stage.py
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds
from vexcl_tpu.config import config
from vexcl_tpu.ops.fft import (
    _cmatmul_radix, _codelet_planar_np, _sincos_2pi, _twiddle_planar)

R = 256          # radix
M = 1 << 16      # post axis
N = R * M        # 2^24
LANE = 128


def _stage_kernel(wa_ref, wb_ref, xr_ref, xi_ref, or_ref, oi_ref, *, sign):
    import jax.experimental.pallas as pl

    j = pl.program_id(0)
    xr = xr_ref[...]                     # (R, LANE)
    xi = xi_ref[...]
    wa = wa_ref[...]                     # (2R, R) = [wr; wi]
    wb = wb_ref[...]                     # (2R, R) = [-wi; wr]
    hp = jax.lax.Precision.HIGHEST       # f32-accurate (X6-equivalent)
    y2 = (jnp.dot(wa, xr, preferred_element_type=jnp.float32, precision=hp)
          + jnp.dot(wb, xi, preferred_element_type=jnp.float32,
                    precision=hp))
    ar, ai = y2[:R, :], y2[R:, :]
    # twiddle W_N^{k1*j2}: k1 = row, j2 = global column.  frac =
    # k1*j2/N with k1*j2 <= 2^24 — exact in f32.
    k1 = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0).astype(jnp.float32)
    j2 = (j * LANE
          + jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)).astype(
              jnp.float32)
    frac = (k1 * j2) * np.float32(1.0 / N)
    tr, ti = _sincos_2pi(frac)
    if sign < 0:
        ti = -ti
    or_ref[...] = ar * tr - ai * ti
    oi_ref[...] = ar * ti + ai * tr


def pallas_stage(xr, xi, wa, wb, sign):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (M // LANE,)
    spec_x = pl.BlockSpec((R, LANE), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((2 * R, R), lambda j: (0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stage_kernel, sign=sign),
        grid=grid,
        in_specs=[spec_w, spec_w, spec_x, spec_x],
        out_specs=[spec_x, spec_x],
        out_shape=[jax.ShapeDtypeStruct((R, M), jnp.float32)] * 2,
        interpret=config.pallas_interpret(),
    )(wa, wb, xr, xi)


def main():
    rng = np.random.default_rng(0)
    xr0 = jnp.asarray(rng.standard_normal((R, M)).astype(np.float32))
    xi0 = jnp.asarray(rng.standard_normal((R, M)).astype(np.float32))
    cr, ci = _codelet_planar_np(R, -1.0, "float32")
    wa = jnp.asarray(np.concatenate([cr, ci], axis=0))
    wb = jnp.asarray(np.concatenate([-ci, cr], axis=0))

    # correctness vs the XLA stage (full size, same twiddle N)
    def xla_stage(xr, xi):
        ar, ai = _cmatmul_radix(jnp.asarray(cr), jnp.asarray(ci), xr, xi)
        tr, ti = _twiddle_planar(R, M, -1.0, xr.dtype)
        return ar * tr - ai * ti, ar * ti + ai * tr

    br_p, bi_p = jax.jit(
        lambda a, b: pallas_stage(a, b, wa, wb, -1.0))(xr0, xi0)
    br_x, bi_x = jax.jit(xla_stage)(xr0, xi0)
    err = float(jnp.max(jnp.abs(br_p - br_x)))
    erri = float(jnp.max(jnp.abs(bi_p - bi_x)))
    print(f"pallas stage max |re|/|im| err vs xla: {err:.3e} / {erri:.3e}")

    # timing
    def step_xla(xr, xi):
        br, bi = xla_stage(xr, xi)
        return br * 1e-3, bi

    def step_pl(xr, xi):
        br, bi = pallas_stage(xr, xi, wa, wb, -1.0)
        return br * 1e-3, bi

    def chain(stepper):
        def link(r, i):
            rr, ii = stepper(r, i)
            return rr
        return link

    gb = 2 * 2 * N * 4 / 1e9  # read both planes + write both

    t_x = slope_seconds(chain(step_xla), xr0, lo=32, hi=288, extra=(xi0,))
    print(f"xla stage   : {t_x*1e3:.3f} ms  {gb/t_x:.0f} GB/s effective")
    t_p = slope_seconds(chain(step_pl), xr0, lo=32, hi=288, extra=(xi0,))
    print(f"pallas stage: {t_p*1e3:.3f} ms  {gb/t_p:.0f} GB/s effective")


if __name__ == "__main__":
    main()

"""256^3 Poisson DIA SpMV: window-kernel block sweep + ring A/B
(VERDICT r2 item 9: >=300 GFLOP/s or evidence the window kernel is
optimal).

Traffic model per output element (bf16 vals, f32 x):
    vals 7*2 = 14 B  +  x window (win/B)*4 B  +  y 4 B
At B=128Ki the window is 2.0x -> 26 B/elem; B=256Ki -> 1.5x -> 24;
B=512Ki (VMEM-capped) -> 1.25x -> 23.  The question is whether the
bigger windows keep the measured DMA rate.  All variants interleaved in
ONE process (docs/tpu_kernel_notes.md cross-process variance).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

M = 256
N = M ** 3


def main():
    import vexcl_tpu as vex  # noqa: F401
    from vexcl_tpu.sparse import pallas_dia as PD
    from vexcl_tpu.utils.poisson import poisson_7pt
    from vexcl_tpu.sparse.dia import try_build_dia

    ptr, col, val = poisson_7pt(M, dtype=np.float32)
    dia = try_build_dia(N, N, np.asarray(ptr, np.int64), col, val)
    offsets = dia.offsets
    vals = jnp.asarray(np.asarray(dia.vals), dtype=jnp.bfloat16)
    x0 = jnp.asarray(np.random.default_rng(0).random(N, dtype=np.float32))
    nnz = int(ptr[-1])
    print("offsets:", offsets, "span:", max(offsets) - min(offsets),
          flush=True)

    results = {}

    def run(tag, blk):
        old = PD.BLOCK
        try:
            # _window_block reads module BLOCK as its floor
            PD.BLOCK = blk
            step = lambda x, v: PD.dia_matvec_pallas(
                N, N, offsets, v, x) * 5e-5
            t = slope_seconds(step, x0, lo=16, hi=96, extra=(vals,))
            gf = (2 * nnz + N) / t / 1e9
            results[tag] = gf
            print(f"{tag:28s} {gf:7.1f} GFLOP/s ({t*1e3:.2f} ms)",
                  flush=True)
        finally:
            PD.BLOCK = old

    # interleave 3 reps of each pair to cancel drift
    # 256Ki+ windows exceed the 16M scoped-vmem limit at AOT compile
    # (30.9M measured): 7 bf16 value rows + double-buffered window pin
    # the kernel at <=192Ki blocks for this band structure
    for rep in range(2):
        run(f"window 128Ki r{rep}", 1024 * 128)
        run(f"window 192Ki r{rep}", 1536 * 128)

    # ring kernel (read-once design, opt-in)
    os.environ["VEXTPU_DIA_RING"] = "1"
    if PD.use_pallas_dia_ring(N, N, offsets, vals):
        step = lambda x, v: PD.dia_matvec_pallas_ring(
            N, N, offsets, v, x) * 5e-5
        t = slope_seconds(step, x0, lo=16, hi=96, extra=(vals,))
        print(f"{'ring':28s} {(2*nnz+N)/t/1e9:7.1f} GFLOP/s", flush=True)
    else:
        print("ring: guard declines this config", flush=True)


if __name__ == "__main__":
    main()

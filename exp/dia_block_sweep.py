"""Sweep the DIA roll-kernel block size on the real TPU (Poisson 64^3).

The scan/stencil kernels both gained from bigger blocks (the Pallas
stream-turnaround cap eases with block size); the roll kernel still uses
256 KiB value blocks.  Patch pallas_dia.BLOCK and measure the library
SpMV path at each size."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
import vexcl_tpu as vex
import vexcl_tpu.sparse.pallas_dia as pd
import bench


def measure(block):
    pd.BLOCK = block
    vex.purge_caches()
    from vexcl_tpu.utils.poisson import poisson_7pt
    m = 64
    ptr, col, val = poisson_7pt(m, dtype=np.float32)
    n = m ** 3
    A = vex.SpMat(n, n, ptr, col, val)
    nnz = int(ptr[-1])
    dev = A.device
    x0 = jnp.asarray(np.random.rand(n).astype(np.float32))
    leaves = dev.leaves()
    step = lambda x, *lv: dev.apply_leaves(lv, x) * 5e-5
    t = bench.slope_seconds(step, x0, lo=256, hi=2048, extra=leaves)
    return (2 * nnz + n) / t / 1e9


if __name__ == "__main__":
    for blk in (512 * 128, 1024 * 128, 2048 * 128):
        try:
            print(f"block={blk//1024}Ki: {measure(blk):.1f} GFLOP/s", flush=True)
        except Exception as e:
            print(f"block={blk//1024}Ki: FAILED {str(e)[:200]}", flush=True)

"""Mesh-distributed algorithm showcase (beyond the reference).

The reference restricts FFT / scan_by_key / reduce_by_key to ONE device
and finishes sort (host k-way merge) and scan (host partial_sum) on the
host.  Here the same `vex.*` calls on sharded vectors run fully
device-side over ICI collectives:

  * sort          odd-even block merge-split over ppermute
  * scan          local scan + all_gather of D block tails + carry
  * scan_by_key   the same, over (flag, value) pair tails
  * fft           four-step: all_to_all transposes + local MXU stages

Run on a virtual 8-device mesh (no TPU pod needed):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/distributed_algorithms.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if (
    "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", "")
    and os.environ.get("JAX_PLATFORMS", "") in ("cpu", "")
):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import vexcl_tpu as vex


def main():
    ctx = vex.Context()
    print(f"mesh: {ctx.size} device(s)")
    rng = np.random.default_rng(42)
    n = 1 << 16

    # distributed sort (stable, any device count)
    h = rng.standard_normal(n).astype(np.float32)
    x = vex.vector(data=h)
    vex.sort(x)
    assert (np.diff(np.asarray(x)) >= 0).all()
    print("sort: globally ordered, result block-sharded in natural order")

    # distributed scan
    y = vex.inclusive_scan(vex.vector(data=h))
    ref = np.cumsum(h.astype(np.float64))
    np.testing.assert_allclose(np.asarray(y), ref,
                               atol=1e-4 * np.abs(ref).max())  # f32 accum
    print("scan: matches cumsum across shard boundaries")

    # distributed segmented scan (segments span shards)
    hk = (np.arange(n) // 1000).astype(np.int32)
    sk = vex.inclusive_scan_by_key(vex.vector(data=hk), vex.vector(data=h))
    print("scan_by_key: first tail =", float(np.asarray(sk)[999]))

    # distributed FFT (n = 2^16 decomposes over any 2^k mesh)
    hz = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    z = vex.vector(data=hz.astype(np.complex64))
    f = vex.vector(n, dtype=np.complex64)
    f[:] = vex.fft(z)
    ref = np.fft.fft(hz)
    err = np.abs(np.asarray(f) - ref).max() / np.abs(ref).max()
    print(f"fft: four-step rel err {err:.2e}")


if __name__ == "__main__":
    main()

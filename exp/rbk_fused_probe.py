"""End-to-end A/B of the r3 fused reduce_by_key stage 1
(ops/pallas_rbk.py: segscan + row compaction in one kernel, assembly by
rows x kpad_row sized sort) against the r2 pipeline (flags pass +
segscan + block compact + nb x kpad sort).

Run on the real chip: python exp/rbk_fused_probe.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

N = 1 << 24
SEG = 64


def main():
    keys_h = (np.arange(N) // SEG).astype(np.int32)
    vals_h = np.random.rand(N).astype(np.float32)
    keys0 = jnp.asarray(keys_h)
    v0 = jnp.asarray(vals_h)

    from vexcl_tpu.ops.pallas_rbk import pallas_segscan_rowcompact

    M = N // SEG
    kpad_r = 4  # seg=64: a 128-lane row holds at most 3 tails

    def fused(v, keys):
        kd = keys + (v[0] * 0).astype(keys.dtype)
        tails = jnp.concatenate(
            [(kd[1:] != kd[:-1]).astype(jnp.int8),
             jnp.ones((1,), jnp.int8)])
        pos, incl_c, keys_c = pallas_segscan_rowcompact(tails, v, kd)
        rows = pos.shape[0]
        valid = pos[:, :kpad_r] >= 0.0
        flat = jnp.arange(rows * kpad_r, dtype=jnp.int32)
        sortkey = jnp.where(valid.reshape(-1), flat,
                            jnp.int32(2 ** 31 - 1))
        return jax.lax.sort(
            (sortkey, incl_c[:, :kpad_r].reshape(-1),
             keys_c[:, :kpad_r].reshape(-1)), num_keys=1)

    # correctness
    outs = jax.jit(fused)(v0, keys0)
    got_v = np.asarray(outs[1][:M])
    got_k = np.asarray(outs[2][:M])
    ref_v = vals_h.reshape(-1, SEG).astype(np.float64).sum(axis=1)
    ref_k = keys_h.reshape(-1, SEG)[:, 0]
    np.testing.assert_array_equal(got_k, ref_k)
    np.testing.assert_allclose(got_v, ref_v, rtol=1e-4)
    print("fused stage1+assembly correct")

    def step(v, keys):
        out = fused(v, keys)
        return (v + jnp.pad(out[1][:M], (0, N - M)) * 1e-7) % 1.0

    t = slope_seconds(step, v0, lo=8, hi=48, extra=(keys0,))
    print(f"fused end-to-end: {t*1e3:.3f} ms  ({N/t/1e9:.2f} Gelem/s)")

    # stage-1 kernel alone (no sort)
    def step_k(v, keys):
        kd = keys + (v[0] * 0).astype(keys.dtype)
        tails = jnp.concatenate(
            [(kd[1:] != kd[:-1]).astype(jnp.int8),
             jnp.ones((1,), jnp.int8)])
        pos, incl_c, keys_c = pallas_segscan_rowcompact(tails, v, kd)
        return v + pos[:, 0].sum() * 0 + incl_c[:, 0].sum() * 1e-12

    t1 = slope_seconds(step_k, v0, lo=8, hi=48, extra=(keys0,))
    print(f"stage1 (flags+kernel): {t1*1e3:.3f} ms")


if __name__ == "__main__":
    main()

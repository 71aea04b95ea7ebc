"""Where do reduce_by_key's 3.7 ms (16M, 4.48 Gelem/s end-to-end) go?

Times each pipeline stage separately with the two-point-slope
methodology (bench.py): (a) XLA heads/tails flags pass, (b) Pallas
segmented cumsum, (c) Pallas block compaction (3 payload planes),
(d) stage-2 sized sort at the library's kpad.  Run on the real chip:

    python exp/rbk_stage_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

N = 1 << 24
SEG = 64


def main():
    keys0 = jnp.asarray((np.arange(N) // SEG).astype(np.int32))
    v0 = jnp.asarray(np.random.rand(N).astype(np.float32))

    from vexcl_tpu.ops.pallas_compact import BLOCK_R, LANE, pallas_compact
    from vexcl_tpu.ops.pallas_segscan import pallas_segmented_cumsum_flags

    block = BLOCK_R * LANE
    kpad = max(512, -(-(block // SEG) // 512) * 512)
    nb = N // block

    # (a) flags pass
    def step_flags(v, keys):
        kd = keys + (v[0] * 0).astype(keys.dtype)
        eq = kd[:-1] == kd[1:]
        heads = jnp.concatenate([jnp.ones((1,), jnp.int8),
                                 (~eq).astype(jnp.int8)])
        tails = jnp.concatenate([(~eq).astype(jnp.int8),
                                 jnp.ones((1,), jnp.int8)])
        return v + heads.astype(jnp.float32) * 1e-7 \
            - tails.astype(jnp.float32) * 1e-7

    t = slope_seconds(step_flags, v0, lo=8, hi=48, extra=(keys0,))
    print(f"flags pass:      {t*1e3:.3f} ms  ({N/t/1e9:.2f} Gelem/s)")

    # (b) segscan
    heads0 = jnp.concatenate(
        [jnp.ones((1,), jnp.int8),
         (keys0[1:] != keys0[:-1]).astype(jnp.int8)])

    def step_seg(v, heads):
        return pallas_segmented_cumsum_flags(heads, v) * (1.0 / SEG)

    t = slope_seconds(step_seg, v0, lo=8, hi=48, extra=(heads0,))
    print(f"segscan:         {t*1e3:.3f} ms  ({N/t/1e9:.2f} Gelem/s)")

    # (c) compact (3 planes: tails -> pos + 2 payloads)
    tails0 = jnp.concatenate(
        [(keys0[1:] != keys0[:-1]).astype(jnp.int8),
         jnp.ones((1,), jnp.int8)])

    def step_compact(v, tails, keys):
        pos, counts, incl_c, keys_c = pallas_compact(tails, v, keys)
        # cheap consumption keeping shapes static
        return v + pos[:, 0].sum() * 0 + incl_c[:, 0].sum() * 1e-12

    t = slope_seconds(step_compact, v0, lo=8, hi=48,
                      extra=(tails0, keys0))
    print(f"compact:         {t*1e3:.3f} ms  ({N/t/1e9:.2f} Gelem/s)")

    # (d) stage-2 sized sort: nb x kpad elements
    pos0 = jnp.asarray(
        np.where(np.arange(nb * kpad).reshape(nb, kpad) % kpad
                 < block // SEG, 1.0, -1.0).astype(np.float32))
    inc0 = jnp.asarray(np.random.rand(nb, kpad).astype(np.float32))
    key0 = jnp.asarray(np.arange(nb * kpad, dtype=np.int32)
                       .reshape(nb, kpad))

    def step_sort(v, pos, incl_c, keys_c):
        valid = pos >= 0.0
        flat = jnp.arange(nb * kpad, dtype=jnp.int32)
        sortkey = jnp.where(valid.reshape(-1), flat,
                            jnp.int32(2 ** 31 - 1))
        _, out, _k = jax.lax.sort(
            (sortkey, incl_c.reshape(-1), keys_c.reshape(-1)), num_keys=1)
        M = min(N, nb * kpad)
        return (v + jnp.pad(out[:M], (0, N - M)) * 1e-7) % 1.0

    t = slope_seconds(step_sort, v0, lo=8, hi=48,
                      extra=(pos0, inc0, key0))
    print(f"stage2 sort ({nb}x{kpad}): {t*1e3:.3f} ms")

    # (e) whole current pipeline for reference
    def step_all(v, keys):
        kd = keys + (v[0] * 0).astype(keys.dtype)
        eq = kd[:-1] == kd[1:]
        heads = jnp.concatenate([jnp.ones((1,), jnp.int8),
                                 (~eq).astype(jnp.int8)])
        tails = jnp.concatenate([(~eq).astype(jnp.int8),
                                 jnp.ones((1,), jnp.int8)])
        incl = pallas_segmented_cumsum_flags(heads, v)
        pos, counts, incl_c, keys_c = pallas_compact(tails, incl, kd)
        valid = pos[:, :kpad] >= 0.0
        flat = jnp.arange(nb * kpad, dtype=jnp.int32)
        sortkey = jnp.where(valid.reshape(-1), flat,
                            jnp.int32(2 ** 31 - 1))
        _, out, _k = jax.lax.sort(
            (sortkey, incl_c[:, :kpad].reshape(-1),
             keys_c[:, :kpad].reshape(-1)), num_keys=1)
        M = min(N, nb * kpad)
        return (v + jnp.pad(out[:M], (0, N - M)) * 1e-7) % 1.0

    t = slope_seconds(step_all, v0, lo=8, hi=48, extra=(keys0,))
    print(f"whole pipeline:  {t*1e3:.3f} ms  ({N/t/1e9:.2f} Gelem/s)")


if __name__ == "__main__":
    main()

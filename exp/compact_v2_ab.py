"""A/B: pallas_compact (r2, 5 shifted planes + floor-scaling bit tests)
vs a v2 kernel with three structural cuts:

  1. no `alive` plane — validity rides the pos payload (-1 sentinel);
     a dead slot's drem is 0, so it never moves and never "arrives";
  2. delta-HALVING bookkeeping: test only the LSB of the remaining
     delta (3 ops) instead of floor-scaling bit k out of the full value
     (10 ops across own+shifted), halving after each step;
  3. payloads update with ONE select (a moved-out slot keeps stale
     payload but its pos is -1, so staleness is unobservable).

Planes shifted per step: v1 = delta, alive, pos, incl, key (5);
v2 = drem, pos, incl, key (4) with cheaper tests.

Run on the real chip: python exp/compact_v2_ab.py
"""

import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_seconds

N = 1 << 24
SEG = 64

LANE = 128
BLOCK_R = 256


def _shift_left_flat(x, d, R, fill=0.0):
    from jax.experimental.pallas import tpu as pltpu

    q, t = divmod(d, LANE)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)
    if t == 0:
        rolled = x if q == 0 else pltpu.roll(x, R - q, axis=0)
        return jnp.where(row < R - q, rolled, fill)
    rolled = pltpu.roll(x, LANE - t, axis=1)
    a = pltpu.roll(rolled, (R - q) % R, axis=0)
    b = pltpu.roll(rolled, (R - q - 1) % R, axis=0)
    y = jnp.where(lane < LANE - t, a, b)
    src = row * LANE + lane + d
    return jnp.where(src < R * LANE, y, fill)


def _v2_kernel(*refs):
    """Inputs: flags, payload_0..k-1; outputs: pos, compacted_0..k-1."""
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    nv = (len(refs) - 2) // 2
    f_ref = refs[0]
    val_refs = refs[1 : 1 + nv]
    o_ref = refs[1 + nv]
    out_refs = refs[2 + nv :]

    R = f_ref.shape[0]
    f = f_ref[...].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    rcol = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    # block-local flat inclusive cumsum of flags (as v1)
    from jax.experimental.pallas import tpu as pltpu

    v = f
    for d in (1, 2, 4, 8, 16, 32, 64):
        v = v + pltpu.roll(v, d, axis=1) * (lane >= d).astype(jnp.float32)
    tails_col = v[:, LANE - 1 : LANE]
    p = pltpu.roll(tails_col, 1, axis=0) * (rcol >= 1).astype(jnp.float32)
    d = 1
    while d < R:
        p = p + pltpu.roll(p, d, axis=0) * (rcol >= d + 1).astype(jnp.float32)
        d *= 2
    incl = v + p

    pos0 = (jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0) * LANE
            + lane).astype(jnp.float32)
    # drem: remaining delta; 0 for dead slots (a live in-place element
    # also has 0 — indistinguishable and equally immobile, fine)
    drem = jnp.where(f > 0, pos0 - (incl - 1.0), 0.0)
    pos = jnp.where(f > 0, pos0, -1.0)
    payload = [r[...] for r in val_refs]

    nbits = int(np.log2(R * LANE))
    for k in range(nbits):
        dk = 1 << k
        h = jnp.floor(drem * 0.5)
        bit = drem - 2.0 * h                      # own LSB
        drem_s = _shift_left_flat(drem, dk, R)
        h_s = jnp.floor(drem_s * 0.5)
        bit_s = drem_s - 2.0 * h_s                # shifted-in LSB
        arrived = bit_s > 0.0
        moved = bit > 0.0
        drem = jnp.where(arrived, h_s, h)
        pos = jnp.where(arrived, _shift_left_flat(pos, dk, R, fill=-1.0),
                        jnp.where(moved, -1.0, pos))
        payload = [
            jnp.where(arrived, _shift_left_flat(pl_, dk, R), pl_)
            for pl_ in payload
        ]

    o_ref[...] = pos
    for r, pl_ in zip(out_refs, payload):
        r[...] = pl_


def pallas_compact_v2(flags, *payloads):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vexcl_tpu.config import config

    n = flags.shape[0]
    BLOCK = BLOCK_R * LANE
    nblocks = max(1, -(-n // BLOCK))
    f2 = flags.reshape(nblocks * BLOCK_R, LANE)
    p2 = [p.reshape(nblocks * BLOCK_R, LANE) for p in payloads]

    spec = pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    k = len(p2)
    outs = pl.pallas_call(
        _v2_kernel,
        grid=(nblocks,),
        in_specs=[spec] * (1 + k),
        out_specs=[spec] * (1 + k),
        out_shape=[jax.ShapeDtypeStruct((nblocks * BLOCK_R, LANE),
                                        jnp.float32)] * (1 + k),
        interpret=config.pallas_interpret(),
    )(f2, *p2)
    return outs


def main():
    keys0 = jnp.asarray((np.arange(N) // SEG).astype(np.int32))
    v0 = jnp.asarray(np.random.rand(N).astype(np.float32))
    tails0 = jnp.concatenate(
        [(keys0[1:] != keys0[:-1]).astype(jnp.int8),
         jnp.ones((1,), jnp.int8)])
    kf0 = jax.lax.bitcast_convert_type(keys0, jnp.float32)

    # correctness vs v1 (on a small slice via jit on device)
    from vexcl_tpu.ops.pallas_compact import pallas_compact

    small = 1 << 19

    @jax.jit
    def both(t, v, kf):
        a = pallas_compact(t, v, kf)
        b = pallas_compact_v2(t, v, kf)
        return a, b

    (pos1, cnt1, i1, k1), (pos2, i2, k2) = both(
        tails0[:small], v0[:small], kf0[:small])
    pos1 = np.asarray(pos1).reshape(-1, BLOCK_R * LANE)
    pos2 = np.asarray(pos2).reshape(-1, BLOCK_R * LANE)
    m1 = pos1 >= 0
    m2 = pos2 >= 0
    assert (m1 == m2).all()
    np.testing.assert_array_equal(pos1[m1], pos2[m2])
    i1 = np.asarray(i1).reshape(pos1.shape)
    i2 = np.asarray(i2).reshape(pos1.shape)
    np.testing.assert_array_equal(i1[m1], i2[m1])
    print("v2 correct vs v1")

    def step_v1(v, tails, kf):
        pos, counts, incl_c, keys_c = pallas_compact(tails, v, kf)
        return v + pos[:, 0].sum() * 0 + incl_c[:, 0].sum() * 1e-12

    def step_v2(v, tails, kf):
        pos, incl_c, keys_c = pallas_compact_v2(tails, v, kf)
        return v + pos[:, 0].sum() * 0 + incl_c[:, 0].sum() * 1e-12

    t1 = slope_seconds(step_v1, v0, lo=8, hi=48, extra=(tails0, kf0))
    print(f"v1 compact: {t1*1e3:.3f} ms ({N/t1/1e9:.2f} Gelem/s)")
    t2 = slope_seconds(step_v2, v0, lo=8, hi=48, extra=(tails0, kf0))
    print(f"v2 compact: {t2*1e3:.3f} ms ({N/t2/1e9:.2f} Gelem/s)")


if __name__ == "__main__":
    main()

"""Bisect the segscan kernel's Mosaic compile time (450-650 s measured,
vs 8 s for the single-array monoid kernel).  Variants strip one phase at
a time; compile each in this process and print wall times."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE, BLOCK_R = 128, 1024


def make(variant):
    def kern(k_ref, x_ref, o_ref, carry_ref, ckey_ref):
        i = pl.program_id(0)
        R = x_ref.shape[0]

        @pl.when(i == 0)
        def _():
            carry_ref[0, 0] = jnp.zeros((), jnp.float32)
            ckey_ref[0, 0] = -jnp.ones((), jnp.int32)

        keys = k_ref[...]
        v = x_ref[...].astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)

        if variant in ("flags", "lane", "full"):
            rolled = pltpu.roll(keys, 1, axis=1)
            up = jnp.concatenate([rolled[:1], rolled[:-1]], axis=0)
            prevk = jnp.where(lane > 0, rolled, up)
            prevk = jnp.where((row == 0) & (lane == 0), ckey_ref[0, 0],
                              prevk)
            f = (keys != prevk).astype(jnp.float32)
            ckey_ref[0, 0] = keys[R - 1, LANE - 1]
        else:
            f = (keys > 0).astype(jnp.float32)  # cheap stand-in

        F = f
        if variant in ("lane", "full", "rowonly-pair"):
            for d in (1, 2, 4, 8, 16, 32, 64):
                if variant == "rowonly-pair":
                    break
                vr = pltpu.roll(v, d, axis=1)
                fr = pltpu.roll(F, d, axis=1)
                take = (lane >= d).astype(jnp.float32)
                v = v + vr * take * (1.0 - F)
                F = jnp.maximum(F, fr * take)

        if variant in ("full", "rowonly-pair"):
            tails = v[:, LANE - 1:LANE]
            anyhead = F[:, LANE - 1:LANE]
            base = carry_ref[0, 0]
            rcol = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            cv = jnp.where(rcol == 0, base, pltpu.roll(tails, 1, axis=0))
            cf = jnp.where(rcol == 0, 0.0, pltpu.roll(anyhead, 1, axis=0))
            d = 1
            while d < R:
                keep = (rcol >= d).astype(jnp.float32)
                vs = pltpu.roll(cv, d, axis=0) * keep
                fs = pltpu.roll(cf, d, axis=0) * keep
                cv = cv + vs * (1.0 - cf)
                cf = jnp.maximum(cf, fs)
                d *= 2
            carry_ref[0, 0] = jnp.where(
                anyhead[R - 1, 0] > 0, tails[R - 1, 0],
                cv[R - 1, 0] + tails[R - 1, 0])
            o_ref[...] = (v + cv * (1.0 - F)).astype(o_ref.dtype)
        else:
            o_ref[...] = (v + F).astype(o_ref.dtype)

    return kern


def compile_one(variant, n=1 << 22):
    keys = jnp.asarray((np.arange(n) // 64).astype(np.int32)).reshape(
        -1, LANE)
    x = jnp.asarray(np.random.rand(n).astype(np.float32)).reshape(-1, LANE)
    nblocks = x.shape[0] // BLOCK_R
    fn = pl.pallas_call(
        make(variant),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((BLOCK_R, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32),
                        pltpu.SMEM((1, 1), jnp.int32)],
    )
    t0 = time.time()
    out = jax.jit(fn)(keys, x)
    float(out[0, 0])
    return time.time() - t0


if __name__ == "__main__":
    for variant in ("flags", "lane", "rowonly-pair", "full"):
        try:
            print(f"{variant}: {compile_one(variant):.1f} s", flush=True)
        except Exception as e:
            print(f"{variant}: FAILED {str(e)[:150]}", flush=True)

"""Honest per-pass A/B of the route executors (sparse/shuffle.py) on the
real chip, all variants in ONE process (cross-process swings +-30%).

r4 findings this probe encodes:
  * chaining t directly into tinv lets XLA compose the transposes into
    identity (the 319 "Gelem/s" trap) — every chain step here is ONE op
    bounded by a multiply+mod, so nothing composes;
  * in-kernel `.T` hangs Mosaic's compiler (>300 s at (256,128)); the
    MXU identity-dot transpose compiles in ~1 s and is bit-exact;
  * a (8,128)-block sub pass pays ~0.2 us/grid-step overhead — 3.3 ms
    at 16K tiles — fixed by many-tile blocks with a static inner loop.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from bench import slope_seconds
from vexcl_tpu.sparse.shuffle import (_lane_perm, _sub_perm, _lsl_perm,
                                      _lane_t, _tinv_lane, _t_pallas,
                                      _tinv_pallas)

R = 1 << 17          # 131072 rows = 16.8M elements (the bench top grid)
G, nb = 1, R // 128
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.random((R, 128), dtype=np.float32))
idx = jnp.asarray(np.argsort(rng.random((R, 128)), axis=1).astype(np.int32))
sub = jnp.asarray((rng.integers(0, 8, (R, 128))).astype(np.int32))

E = R * 128
c = np.float32(1.0000001)

def rate(name, step, extra=(), lo=16, hi=144):
    t = slope_seconds(step, x0, lo=lo, hi=hi, extra=extra)
    print(f"{name:26s} {E/t/1e9:8.1f} Gelem/s  {t*1e3:7.3f} ms/pass",
          flush=True)
    return t

# anchors
rate("lane", lambda v, i: (_lane_perm(v, i) * c) % 1.0, (idx,))
rate("sub (big blocks)", lambda v, s: (_sub_perm(v, s) * c) % 1.0, (sub,))

# single transposes, composition broken by the multiply between steps
def xla_t(v):
    return ((v.reshape(G, R, 128).transpose(0, 2, 1)
             .reshape(G * 128 * nb, 128)) * c) % 1.0
rate("xla t (single)", xla_t)
rate("pallas t (mxu dot)", lambda v: (_t_pallas(v, G, R) * c) % 1.0)
rate("pallas tinv (mxu dot)", lambda v: (_tinv_pallas(v, G, R) * c) % 1.0)

# fused vs parts
rate("lane_t (fused)", lambda v, i: (_lane_t(v, i, G, R) * c) % 1.0, (idx,))
rate("tinv_lane (fused)",
     lambda v, i: (_tinv_lane(v, i, G, R) * c) % 1.0, (idx,))
rate("lsl (fused, big blocks)",
     lambda v, a, s, cc: (_lsl_perm(v, a, s, cc) * c) % 1.0,
     (idx, sub, idx))

"""Bisect the fused-T-expand + premultiply crash scale on the real chip.

The no-mul kernel compiles and runs at nb=1024 (the bench grid); with the
vsrc multiply it crashed the backend at nb=256 (n=1<<17 pipeline) but ran
at nb=16 standalone.  Sweep nb to find the threshold; each size runs in a
subprocess so a crash doesn't poison the sweep.
"""
import os
import subprocess
import sys

CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
from vexcl_tpu.sparse.shuffle import _expand_gather_vmem_T
rng = np.random.default_rng(0)
chunk_rows = 32
nb = int(sys.argv[1]); F2 = 8
nchunks = nb * 128 // chunk_rows - 3
x_rows = 1024
xt = jnp.asarray(rng.standard_normal((x_rows, 128)).astype(np.float32))
toc = jnp.asarray(rng.integers(0, x_rows // 8, nb * 128 // chunk_rows).astype(np.int32))
s = jnp.asarray(rng.integers(0, 8, (nb * 128, 128)).astype(np.int8))
l = jnp.asarray(rng.integers(0, 128, (nb * 128, 128)).astype(np.int8))
v = jnp.asarray(rng.standard_normal((nb * 128, 128)).astype(np.float32))
t0 = time.time()
outm = np.asarray(_expand_gather_vmem_T(xt, toc, s, l, nchunks, chunk_rows,
                                        nb, F2, vsrc=v))
print(f"nb={nb}: mul ok in {time.time()-t0:.0f} s", flush=True)
"""

for nb in (64, 128, 256):
    r = subprocess.run([sys.executable, "-c", CHILD, str(nb)],
                       capture_output=True, text=True, timeout=1200)
    out = (r.stdout + r.stderr).strip().splitlines()
    msg = [ln for ln in out if "mul ok" in ln or "Error" in ln or "error" in ln]
    print(f"nb={nb}: rc={r.returncode}", msg[-1] if msg else out[-1:])

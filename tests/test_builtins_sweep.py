"""Catalog-wide sweep: every builtin in BUILTINS evaluated through the
EXPRESSION path (traced FuncCall -> compiled kernel) must equal its eager
dual-functor result (function.hpp:243 behavior) on the same inputs.

The individually-tested functions (tests/test_builtins_extra.py,
test_vector_arithmetics.py) pin numeric parity against numpy oracles;
this sweep pins the expression PLUMBING for the whole catalog — emit,
signature, dtype handling — so a rarely-used builtin (acospi, logb,
maxmag, ...) can't silently break.
"""

import numpy as np
import pytest

import vexcl_tpu as vex
from vexcl_tpu.expr.builtins import BUILTINS

N = 1024

# functions that do not fit the generic (float-vector)*k call shape
SKIP = {
    # pair/tuple returning — individually tested in test_builtins_extra
    "sincos", "modf", "fract", "frexp", "remquo", "lgamma_r",
    # integer-domain — individually tested
    "clz", "popcount", "mul24", "mad24", "mul_hi", "mad_hi", "rotate",
    "abs_diff", "add_sat", "sub_sat", "hadd", "rhadd", "mad_sat",
    "bitselect", "upsample",
    # geometric chapter: multivector operands — individually tested
    "cross", "dot", "distance", "length", "normalize",
    "fast_distance", "fast_length", "fast_normalize",
    # int second argument
    "ldexp", "pown", "rootn", "nan",
    # reduction-style / special semantics
    "any", "all",
    # classification returning ints from floats is fine; shift needs ints
    "ilogb",
}

# domain restrictions: (low, high) for EVERY float argument
DOMAIN = {
    "acos": (-0.95, 0.95), "asin": (-0.95, 0.95), "atanh": (-0.95, 0.95),
    "acospi": (-0.95, 0.95), "asinpi": (-0.95, 0.95),
    "acosh": (1.05, 3.0), "log": (0.05, 3.0), "log2": (0.05, 3.0),
    "log10": (0.05, 3.0), "log1p": (0.05, 3.0), "logb": (0.05, 3.0),
    "sqrt": (0.0, 3.0), "rsqrt": (0.05, 3.0), "cbrt": (0.05, 3.0),
    "powr": (0.05, 3.0), "tgamma": (0.1, 3.0), "lgamma": (0.1, 3.0),
    "erfinv": (-0.9, 0.9),
}


def _arity(b):
    """Smallest k in 1..3 the eager functor accepts."""
    for k in (1, 2, 3):
        try:
            b.impl(*([np.float64(0.5)] * k))
            return k
        except Exception:
            continue
    return None


@pytest.mark.parametrize("name", sorted(BUILTINS))
def test_expression_matches_eager(name, ctx, rng):
    if name in SKIP:
        pytest.skip("individually tested / non-generic call shape")
    b = BUILTINS[name]
    k = _arity(b)
    if k is None:
        pytest.skip("no generic float arity")
    lo, hi = DOMAIN.get(name, (0.05, 0.95))
    hosts = [(rng.random(N) * (hi - lo) + lo).astype(np.float64)
             for _ in range(k)]
    vecs = [vex.vector(data=h, context=ctx) for h in hosts]
    got = np.asarray(vex.eval(b(*vecs)))
    want = np.asarray(b.impl(*hosts))
    np.testing.assert_allclose(got, want.astype(got.dtype), rtol=1e-12,
                               atol=1e-12)

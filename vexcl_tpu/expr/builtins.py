"""Builtin device-function catalog.

Analog of the reference's builtin math-function terminals
(vexcl/function.hpp: builtin catalog; operations.hpp:575-628 UserFunction).
Every OpenCL builtin VexCL exposes gets an expression-builder here that maps
onto the jnp/lax equivalent; applied to plain numbers/arrays they compute
eagerly (the VEX_DUAL_FUNCTOR behavior, function.hpp:243).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .node import Expr, FuncCall, as_expr

# the catalog exports device functions named `any`, `all`, `abs`, `min`,
# `max`, ... into this module's globals (so `vex.any` etc. exist, like
# the reference's vex::any); keep the Python originals for internal use
_py_any = any

__all__ = ["builtin", "BUILTINS"]


class builtin:
    """A named device function usable in expressions and on plain values."""

    def __init__(self, name: str, impl: Callable, nargs: int | None = None):
        self.name = name
        self.impl = impl
        self.nargs = nargs
        self.__name__ = name

    def __call__(self, *args):
        # componentwise lift over multivector / MultiExpr operands
        multi = [a for a in args if hasattr(a, "components") or hasattr(a, "_as_multi")]
        if multi:
            m = multi[0]
            nparts = m.nparts

            def comp(a, i):
                if hasattr(a, "_as_multi"):
                    return a(i)._as_terminal()
                if hasattr(a, "components"):
                    return a.components[i]
                return a

            from ..multivector import MultiExpr

            return MultiExpr(
                [self(*[comp(a, i) for a in args]) for i in range(nparts)]
            )
        if _py_any(isinstance(a, Expr) or hasattr(a, "_as_terminal")
                   for a in args):
            return FuncCall(self.name, self.impl, [as_expr(a) for a in args])
        return self.impl(*args)

    def __repr__(self):
        return f"<device function {self.name}>"


def _mad(a, b, c):
    return a * b + c


def _clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def _mix(x, y, a):
    return x + (y - x) * a


def _step(edge, x):
    return jnp.where(x < edge, 0.0, 1.0).astype(jnp.result_type(x))


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _add_sat(a, b):
    """Saturating integer add (OpenCL add_sat) via in-dtype overflow
    detection — no wider type needed."""
    dt = jnp.result_type(a, b)
    info = jnp.iinfo(dt)
    s = a + b
    if jnp.issubdtype(dt, jnp.unsignedinteger):
        return jnp.where(s < a, info.max, s)
    up = (a > 0) & (b > 0) & (s < 0)
    dn = (a < 0) & (b < 0) & (s >= 0)
    return jnp.where(up, info.max, jnp.where(dn, info.min, s))


def _sub_sat(a, b):
    dt = jnp.result_type(a, b)
    info = jnp.iinfo(dt)
    s = a - b
    if jnp.issubdtype(dt, jnp.unsignedinteger):
        return jnp.where(b > a, jnp.array(0, dt), s)
    up = (a >= 0) & (b < 0) & (s < 0)
    dn = (a < 0) & (b > 0) & (s >= 0)
    return jnp.where(up, info.max, jnp.where(dn, info.min, s))


def _mul_hi_u32(a, b):
    """High 32 bits of a u32 product from 16-bit partial products (the
    ops/random.py trick — no u64 on TPU)."""
    a = a.astype(jnp.uint32) if hasattr(a, "astype") else jnp.uint32(a)
    b = b.astype(jnp.uint32) if hasattr(b, "astype") else jnp.uint32(b)
    a_lo, a_hi = a & 0xFFFF, a >> 16
    b_lo, b_hi = b & 0xFFFF, b >> 16
    mid = a_hi * b_lo + ((a_lo * b_lo) >> 16)
    mid2 = a_lo * b_hi + (mid & 0xFFFF)
    return a_hi * b_hi + (mid >> 16) + (mid2 >> 16)


def _mul_hi(a, b):
    dt = jnp.result_type(a, b)
    if jnp.issubdtype(dt, jnp.unsignedinteger):
        if jnp.dtype(dt).itemsize < 4:
            wide = (a.astype(jnp.uint32) * b.astype(jnp.uint32))
            return (wide >> (8 * jnp.dtype(dt).itemsize)).astype(dt)
        return _mul_hi_u32(a, b)
    if jnp.dtype(dt).itemsize < 4:
        wide = (a.astype(jnp.int32) * b.astype(jnp.int32))
        return (wide >> (8 * jnp.dtype(dt).itemsize)).astype(dt)
    # signed 32: uhi - (a<0)*b - (b<0)*a (two's-complement identity)
    ua = a.astype(jnp.uint32)
    ub = b.astype(jnp.uint32)
    uhi = _mul_hi_u32(ua, ub).astype(jnp.int32)
    return uhi - jnp.where(a < 0, b, 0) - jnp.where(b < 0, a, 0)


def _hadd(a, b):
    return (a & b) + ((a ^ b) >> 1)


def _rhadd(a, b):
    return (a | b) - ((a ^ b) >> 1)


def _upsample(hi, lo):
    """(hi << bits(lo)) | lo with the double-width result type
    (8->16, 16->32; 32->64 needs x64 enabled)."""
    dt = jnp.result_type(hi)
    bits = 8 * jnp.dtype(dt).itemsize
    signed = jnp.issubdtype(dt, jnp.signedinteger)
    wide = {8: jnp.int16 if signed else jnp.uint16,
            16: jnp.int32 if signed else jnp.uint32,
            32: jnp.int64 if signed else jnp.uint64}[bits]
    lo_u = jnp.asarray(lo).astype(
        {8: jnp.uint8, 16: jnp.uint16, 32: jnp.uint32}[bits])
    return (jnp.asarray(hi).astype(wide) << bits) | lo_u.astype(wide)


def _mad_sat(a, b, c):
    """Saturating a*b+c on the infinitely-precise product (OpenCL
    mad_sat), via a simulated hi:lo 64-bit accumulator (no u64 on TPU)."""
    dt = jnp.result_type(a, b, c)
    if jnp.dtype(dt).itemsize < 4:
        signed = jnp.issubdtype(dt, jnp.signedinteger)
        wt = jnp.int32 if signed else jnp.uint32
        wide = a.astype(wt) * b.astype(wt) + c.astype(wt)
        info = jnp.iinfo(dt)
        return jnp.clip(wide, info.min, info.max).astype(dt)
    if jnp.issubdtype(dt, jnp.unsignedinteger):
        p_hi = _mul_hi_u32(a, b)
        p_lo = a * b
        s_lo = p_lo + c
        s_hi = p_hi + (s_lo < p_lo)
        return jnp.where(s_hi != 0, jnp.iinfo(dt).max, s_lo)
    p_hi = _mul_hi(a, b)                      # i32 high word
    p_lo = (a * b).astype(jnp.uint32)         # exact low 32 bits
    c_lo = c.astype(jnp.uint32)
    c_hi = c >> 31                            # arithmetic sign extension
    s_lo = p_lo + c_lo
    s_hi = p_hi + c_hi + (s_lo < p_lo).astype(jnp.int32)
    s_lo_i = s_lo.astype(jnp.int32)
    in_range = s_hi == (s_lo_i >> 31)
    info = jnp.iinfo(jnp.int32)
    return jnp.where(in_range, s_lo_i,
                     jnp.where(s_hi < 0, info.min, info.max))


def _bitselect(a, b, c):
    return (a & ~c) | (b & c)


def _fract(x):
    """Fractional part per OpenCL fract: fmin(x - floor(x), 1-ulp)."""
    one_below = jnp.nextafter(jnp.asarray(1, jnp.result_type(x)), 0)
    return jnp.minimum(x - jnp.floor(x), one_below)


def _scalar_msb(x):
    """OpenCL scalar any/all: the MSB of an integer argument."""
    return (x < 0).astype(jnp.int32)


def _sincos(x):
    return jnp.sin(x), jnp.cos(x)


def _rootn(x, n):
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / n)


def _exp10(x):
    return jnp.power(10.0, x)


def _rsqrt(x):
    return jax.lax.rsqrt(x)


def _native(f):
    return f  # "native_" OpenCL variants: XLA picks the fast path itself


_CATALOG = {
    # trigonometric
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
    "asin": jnp.arcsin, "acos": jnp.arccos, "atan": jnp.arctan,
    "atan2": jnp.arctan2,
    "sinpi": lambda x: jnp.sin(jnp.pi * x),
    "cospi": lambda x: jnp.cos(jnp.pi * x),
    "tanpi": lambda x: jnp.tan(jnp.pi * x),
    "asinpi": lambda x: jnp.arcsin(x) / jnp.pi,
    "acospi": lambda x: jnp.arccos(x) / jnp.pi,
    "atanpi": lambda x: jnp.arctan(x) / jnp.pi,
    "atan2pi": lambda y, x: jnp.arctan2(y, x) / jnp.pi,
    # hyperbolic
    "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
    "asinh": jnp.arcsinh, "acosh": jnp.arccosh, "atanh": jnp.arctanh,
    # exponential / log
    "exp": jnp.exp, "exp2": jnp.exp2, "exp10": _exp10, "expm1": jnp.expm1,
    "log": jnp.log, "log2": jnp.log2, "log10": jnp.log10, "log1p": jnp.log1p,
    "logb": lambda x: jnp.floor(jnp.log2(jnp.abs(x))),
    # power / roots
    "pow": jnp.power, "pown": jnp.power, "powr": jnp.power,
    "sqrt": jnp.sqrt, "rsqrt": _rsqrt, "cbrt": jnp.cbrt, "rootn": _rootn,
    "hypot": jnp.hypot,
    # rounding
    "ceil": jnp.ceil, "floor": jnp.floor, "trunc": jnp.trunc,
    "round": jnp.round, "rint": jnp.rint, "nearbyint": jnp.rint,
    # abs / sign / remainder
    "fabs": jnp.abs, "abs": jnp.abs, "sign": jnp.sign,
    "fmod": jnp.fmod,
    # C/OpenCL remainder is IEEE 754 (round-to-nearest quotient,
    # result may be negative) — NOT the Python/jnp mod
    "remainder": lambda x, y: x - jnp.rint(x / y) * y,
    "copysign": jnp.copysign, "nextafter": jnp.nextafter,
    "fdim": lambda a, b: jnp.maximum(a - b, 0),
    "abs_diff": lambda a, b: jnp.abs(a - b),
    # min/max/clamp family
    "fmin": jnp.minimum, "fmax": jnp.maximum,
    "min": jnp.minimum, "max": jnp.maximum,
    "clamp": _clamp, "mix": _mix, "step": _step, "smoothstep": _smoothstep,
    "maxmag": lambda a, b: jnp.where(jnp.abs(a) >= jnp.abs(b), a, b),
    "minmag": lambda a, b: jnp.where(jnp.abs(a) <= jnp.abs(b), a, b),
    # fused / fast arithmetic
    "mad": _mad, "fma": _mad, "mad24": _mad, "mul24": lambda a, b: a * b,
    "mad_hi": lambda a, b, c: jnp.right_shift(a * b, 0) + c,
    # special functions
    "erf": jax.scipy.special.erf, "erfc": jax.scipy.special.erfc,
    "tgamma": lambda x: jnp.where(
        x > 0,
        jnp.exp(jax.scipy.special.gammaln(x)),
        # reflection formula for x <= 0
        jnp.pi
        / (jnp.sin(jnp.pi * x) * jnp.exp(jax.scipy.special.gammaln(1.0 - x))),
    ),
    "lgamma": jax.scipy.special.gammaln,
    # classification
    "isnan": jnp.isnan, "isinf": jnp.isinf, "isfinite": jnp.isfinite,
    "isnormal": lambda x: jnp.isfinite(x) & (x != 0),
    "signbit": jnp.signbit,
    "isequal": lambda a, b: a == b, "isnotequal": lambda a, b: a != b,
    "isgreater": lambda a, b: a > b, "isgreaterequal": lambda a, b: a >= b,
    "isless": lambda a, b: a < b, "islessequal": lambda a, b: a <= b,
    "islessgreater": lambda a, b: a != b,
    # conversions / bit ops
    "degrees": jnp.degrees, "radians": jnp.radians,
    "ldexp": jnp.ldexp,
    "popcount": lambda x: jax.lax.population_count(x),
    "clz": lambda x: jax.lax.clz(x),
    "rotate": lambda x, s: (x << s) | (x >> (x.dtype.itemsize * 8 - s)),
    # selection
    "select": lambda a, b, c: jnp.where(c, b, a),
    "bitselect": _bitselect,
    # saturating / carry-less integer arithmetic
    "add_sat": _add_sat, "sub_sat": _sub_sat,
    "mad_sat": _mad_sat,
    "mul_hi": _mul_hi, "hadd": _hadd, "rhadd": _rhadd,
    "upsample": _upsample,
    "__popc": lambda x: jax.lax.population_count(x),
    "__popcll": lambda x: jax.lax.population_count(x),
    # scalar any/all (MSB test, OpenCL relational chapter); over
    # multivectors the generic componentwise lift applies
    "any": _scalar_msb, "all": _scalar_msb,
    # float decomposition / classification leftovers
    "fract": _fract,
    "ilogb": lambda x: jnp.frexp(x)[1] - 1,
    "nan": lambda code: jnp.full(jnp.shape(code), jnp.nan, jnp.float32),
    "isordered": lambda a, b: ~(jnp.isnan(a) | jnp.isnan(b)),
    "isunordered": lambda a, b: jnp.isnan(a) | jnp.isnan(b),
    # complex helpers (beyond reference: convenient on TPU)
    "real": jnp.real, "imag": jnp.imag, "conj": jnp.conj,
}

BUILTINS = {name: builtin(name, impl) for name, impl in _CATALOG.items()}

globals().update(BUILTINS)
__all__ += list(BUILTINS)


# -- multi-output builtins (OpenCL pointer-arg forms; here: expression
# pairs — fuse both into one kernel with vex.tie / multivector) ---------

_CATALOG_HIDDEN = {
    "frexp_mant": lambda x: jnp.frexp(x)[0],
    "frexp_exp": lambda x: jnp.frexp(x)[1],
    "gamma_sign": lambda x: jnp.where(
        (x > 0) | (jnp.floor(x * 0.5) * 2 == jnp.floor(x)), 1, -1
    ),
}
for _n, _f in _CATALOG_HIDDEN.items():
    BUILTINS[_n] = builtin(_n, _f)


def sincos(x):
    """OpenCL sincos(x, &c): returns (sin(x), cos(x)) expressions."""
    return BUILTINS["sin"](x), BUILTINS["cos"](x)


def modf(x):
    """(fractional, integral) parts, both carrying x's sign."""
    ip = BUILTINS["trunc"](x)
    return x - ip, ip


def frexp(x):
    """(mantissa in +-[0.5, 1), integer exponent)."""
    return BUILTINS["frexp_mant"](x), BUILTINS["frexp_exp"](x)


def remquo(x, y):
    """(remainder(x, y), integer quotient rounded-to-nearest)."""
    return BUILTINS["remainder"](x, y), BUILTINS["rint"](x / y)


def lgamma_r(x):
    """(lgamma(x), sign of gamma(x))."""
    return BUILTINS["lgamma"](x), BUILTINS["gamma_sign"](x)


__all__ += ["sincos", "modf", "frexp", "remquo", "lgamma_r"]


# -- geometric builtins over N-component data (OpenCL geometric chapter;
# the reference applies them to cl_vectorN, here to multivector /
# MultiExpr / tuples of expressions) ------------------------------------


def _parts(v):
    if hasattr(v, "components"):
        return list(v.components)
    if hasattr(v, "_as_multi") or hasattr(v, "nparts"):
        return [v(i)._as_terminal() for i in range(v.nparts)]
    if isinstance(v, (tuple, list)):
        return [as_expr(a) if not hasattr(a, "_as_terminal") else a for a in v]
    return [v]


def dot(a, b):
    """Component dot product -> one expression (geometric dot, not the
    matrix product)."""
    pa, pb = _parts(a), _parts(b)
    if len(pa) != len(pb):
        raise ValueError("dot: component counts differ")
    acc = None
    for x, y in zip(pa, pb):
        term = x * y
        acc = term if acc is None else acc + term
    return acc


def length(a):
    return BUILTINS["sqrt"](dot(a, a))


def distance(a, b):
    from ..multivector import MultiExpr

    pa, pb = _parts(a), _parts(b)
    return length(MultiExpr([x - y for x, y in zip(pa, pb)]))


def normalize(a):
    from ..multivector import MultiExpr

    inv = BUILTINS["rsqrt"](dot(a, a))
    return MultiExpr([x * inv for x in _parts(a)])


def cross(a, b):
    from ..multivector import MultiExpr

    (a0, a1, a2), (b0, b1, b2) = _parts(a), _parts(b)
    return MultiExpr([a1 * b2 - a2 * b1, a2 * b0 - a0 * b2,
                      a0 * b1 - a1 * b0])


fast_length = length
fast_distance = distance
fast_normalize = normalize


def shuffle(x, mask):
    """OpenCL shuffle with a STATIC component mask: pick components of a
    multivector.  (A per-element dynamic mask is a gather — use
    vex.permutation for that.)"""
    from ..multivector import MultiExpr

    p = _parts(x)
    return MultiExpr([p[int(i)] for i in mask])


def shuffle2(x, y, mask):
    from ..multivector import MultiExpr

    p = _parts(x) + _parts(y)
    return MultiExpr([p[int(i)] for i in mask])


__all__ += ["dot", "length", "distance", "normalize", "cross",
            "fast_length", "fast_distance", "fast_normalize",
            "shuffle", "shuffle2"]

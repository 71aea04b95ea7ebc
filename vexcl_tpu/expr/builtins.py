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
        if any(isinstance(a, Expr) or hasattr(a, "_as_terminal") for a in args):
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
    "fmod": jnp.fmod, "remainder": jnp.remainder,
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
    # complex helpers (beyond reference: convenient on TPU)
    "real": jnp.real, "imag": jnp.imag, "conj": jnp.conj,
}

BUILTINS = {name: builtin(name, impl) for name, impl in _CATALOG.items()}

globals().update(BUILTINS)
__all__ += list(BUILTINS)

"""vex::constants — the named math-constant catalog.

Analog of vexcl/constants.hpp:164-240: every Boost.Math constant the
reference wraps with VEX_CONSTANT, as double-precision values.  Each entry
is usable both ways the reference allows:

* in an expression: ``x[:] = 2 * vex.constants.pi() * y`` — ``pi()``
  returns a ConstantTerminal whose value is baked into the kernel
  signature (constants.hpp operator());
* as a plain scalar: ``float(vex.constants.pi)`` or directly in host
  arithmetic (constants.hpp operator value_type()) — the catalog entries
  subclass ``float``.
"""

from __future__ import annotations

import math

from .node import ConstantTerminal

__all__ = ["MathConstant", "catalog"]


class MathConstant(float):
    """A named double constant; calling it yields an expression terminal."""

    def __new__(cls, name: str, value: float):
        self = super().__new__(cls, value)
        self._name = name
        return self

    @property
    def name(self) -> str:
        return self._name

    def __call__(self) -> ConstantTerminal:
        return ConstantTerminal(float(self), f"constants.{self._name}")

    def __repr__(self) -> str:
        return f"vex.constants.{self._name} = {float(self)!r}"


_pi = math.pi
_e = math.e
_euler = 0.5772156649015328606065120900824024  # Euler–Mascheroni
_phi = (1.0 + math.sqrt(5.0)) / 2.0

# value table mirroring boost::math::constants (constants.hpp:167-240)
_VALUES = {
    "pi": _pi,
    "root_pi": math.sqrt(_pi),
    "root_half_pi": math.sqrt(_pi / 2.0),
    "root_two_pi": math.sqrt(2.0 * _pi),
    "root_ln_four": math.sqrt(math.log(4.0)),
    "e": _e,
    "half": 0.5,
    "euler": _euler,
    "root_two": math.sqrt(2.0),
    "ln_two": math.log(2.0),
    "ln_ln_two": math.log(math.log(2.0)),
    "third": 1.0 / 3.0,
    "twothirds": 2.0 / 3.0,
    "pi_minus_three": _pi - 3.0,
    "four_minus_pi": 4.0 - _pi,
    "two_pi": 2.0 * _pi,
    "half_root_two": math.sqrt(2.0) / 2.0,
    "exp_minus_half": math.exp(-0.5),
    "one_div_two_pi": 1.0 / (2.0 * _pi),
    "catalan": 0.9159655941772190150546035149324,
    "cbrt_pi": _pi ** (1.0 / 3.0),
    "cosh_one": math.cosh(1.0),
    "cos_one": math.cos(1.0),
    "degree": _pi / 180.0,
    "e_pow_pi": math.exp(_pi),
    "euler_sqr": _euler * _euler,
    # ExtremeValue (Gumbel) skewness: 12*sqrt(6)*zeta(3)/pi^3
    "extreme_value_skewness":
        12.0 * math.sqrt(6.0) * 1.2020569031595942854 / _pi**3,
    "four_thirds_pi": 4.0 * _pi / 3.0,
    "glaisher": 1.2824271291006226368753425688698,
    "half_pi": _pi / 2.0,
    "khinchin": 2.6854520010653064453097148354818,
    "ln_phi": math.log(_phi),
    "ln_ten": math.log(10.0),
    "log10_e": math.log10(_e),
    "one_div_cbrt_pi": 1.0 / _pi ** (1.0 / 3.0),
    "one_div_euler": 1.0 / _euler,
    "one_div_ln_phi": 1.0 / math.log(_phi),
    "one_div_log10_e": 1.0 / math.log10(_e),
    "one_div_root_pi": 1.0 / math.sqrt(_pi),
    "one_div_root_two": 1.0 / math.sqrt(2.0),
    "one_div_root_two_pi": 1.0 / math.sqrt(2.0 * _pi),
    "phi": _phi,
    "pi_cubed": _pi**3,
    "pi_pow_e": _pi**_e,
    "pi_sqr": _pi * _pi,
    "pi_sqr_div_six": _pi * _pi / 6.0,
    "radian": 180.0 / _pi,
    # Rayleigh distribution shape constants
    "rayleigh_kurtosis": 3.0 - (6.0 * _pi**2 - 24.0 * _pi + 16.0)
        / (4.0 - _pi) ** 2,
    "rayleigh_kurtosis_excess": -(6.0 * _pi**2 - 24.0 * _pi + 16.0)
        / (4.0 - _pi) ** 2,
    "rayleigh_skewness": 2.0 * math.sqrt(_pi) * (_pi - 3.0)
        / (4.0 - _pi) ** 1.5,
    "root_e": math.sqrt(_e),
    "root_one_div_pi": math.sqrt(1.0 / _pi),
    "root_three": math.sqrt(3.0),
    "root_two_div_pi": math.sqrt(2.0 / _pi),
    "sinh_one": math.sinh(1.0),
    "sin_one": math.sin(1.0),
    "sixth_pi": _pi / 6.0,
    "third_pi": _pi / 3.0,
    "three_quarters": 0.75,
    "three_quarters_pi": 3.0 * _pi / 4.0,
    "two_div_pi": 2.0 / _pi,
    "two_thirds": 2.0 / 3.0,
    "two_thirds_pi": 2.0 * _pi / 3.0,
    "zeta_three": 1.2020569031595942854,
    "zeta_two": _pi * _pi / 6.0,
}

catalog = {name: MathConstant(name, value) for name, value in _VALUES.items()}
globals().update(catalog)
__all__ += sorted(catalog)

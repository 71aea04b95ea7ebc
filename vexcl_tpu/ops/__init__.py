"""Algorithm layer (the reference's L5 + native-perf-critical kernels)."""

from .reductor import SUM, MIN, MAX, SUM_Kahan, MIN_MAX, CombineReductors, Reductor
from .logical import all_of, any_of
from .scan import exclusive_scan, inclusive_scan, scan
from .scan_by_key import exclusive_scan_by_key, inclusive_scan_by_key
from .reduce_by_key import reduce_by_key
from .sort import sort, sort_by_key
from .atomic import atomic_add, atomic_max, atomic_min, atomic_sub
from .gather import Gather, Scatter, gather, scatter
from .random import Random, RandomNormal, philox4x32, threefry2x32
from .stencil import StencilOperator, stencil, stencil_operator
from .fft import FFT, fft, ifft
from .mba import mba
from .tensordot import axes_pairs, tensordot
from .image import image2d, svm_vector

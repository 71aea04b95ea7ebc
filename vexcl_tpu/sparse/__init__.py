"""Sparse matrix subsystem (vexcl/spmat.hpp + vexcl/sparse/*)."""

from .dia import DIA as dia, try_build_dia
from .formats import CSR as csr, ELL as ell, Hybrid, choose_ell_width, from_csr_host
from .shuffle import SELLR as sellr
from .spmat import SpMat, SpMatCCSR, make_inline, matrix
from .distributed import distributed

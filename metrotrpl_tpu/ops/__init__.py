"""TPU-oriented numerical ops: block-tridiagonal solvers, structured
Jacobians, interpolation, and IRF convolution kernels."""

from metrotrpl_tpu.ops.blocktridiag import (  # noqa: F401
    block_tridiag_jacobian,
    pcr_factor,
    pcr_apply,
    pcr_solve,
    thomas_solve,
    inv_small,
    block_tridiag_matvec,
)
from metrotrpl_tpu.ops.interp import interp1d, searchsorted_interp  # noqa: F401

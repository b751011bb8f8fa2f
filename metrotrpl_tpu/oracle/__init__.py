"""Float64 scipy/numpy oracle implementation of the forward models.

This is the comparison implementation used by the test suite and by the
benchmark harness as the "reference CPU" denominator (the actual reference
package is not importable here because numba is not installed — see
BASELINE.md). It implements the same mathematics as the reference's
``forward_solver.py`` solve path: LSODA stiff integration of the 1D
drift-diffusion-recombination model with TRPL/TRTS observables.
"""

from metrotrpl_tpu.oracle.scipy_reference import (  # noqa: F401
    dydt_std,
    dydt_traps,
    efield_init,
    solve_reference,
    calculate_pl,
    calculate_trts,
)

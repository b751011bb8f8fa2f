"""Implicit time integration for the carrier models.

Replaces the reference's adaptive scipy LSODA integration
(reference forward_solver.py:162-178) with L-stable SDIRK schemes on a
static step grid: one block-tridiagonal factorization per step (parallel
cyclic reduction) shared by all stages and modified-Newton iterations, all
batched over simulations and compiled into a single ``lax.scan``.
"""

from metrotrpl_tpu.solver.sdirk import (  # noqa: F401
    SDIRK_SCHEMES,
    sdirk_step,
    integrate_observables,
)
from metrotrpl_tpu.solver.forward import (  # noqa: F401
    ForwardPlan,
    make_forward_plan,
    solve_forward_batch,
    solve_single,
)

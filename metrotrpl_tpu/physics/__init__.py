"""JAX physics layer: scaled excess-density carrier models and observables.

The TPU-native state is (dN, dP, E~) in normalized units (excess densities
divided by a per-simulation scale, E divided by its natural unit), which keeps
every state component O(1) so the whole pipeline is float32-safe on TPU while
remaining exactly equivalent algebra to the reference's (N, P, E) form
(reference forward_solver.py:277-418).
"""

from metrotrpl_tpu.physics.models import (  # noqa: F401
    ScaledParams,
    make_scaled_params,
    rhs_std,
    rhs_traps,
    initial_state,
    observables_std,
    observable_multipliers,
    beer_lambert,
    efield_init,
    N_COMP,
)
from metrotrpl_tpu.physics.grid import SpaceGrid, TimeGrid, plan_time_grid  # noqa: F401

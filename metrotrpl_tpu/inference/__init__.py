"""Inference layer: likelihood evaluation, trial moves, Metropolis-Hastings
with parallel tempering, dense sampling, and maximum likelihood."""

from metrotrpl_tpu.inference.likelihood import (  # noqa: F401
    LikelihoodPlan,
    build_likelihood_plan,
    make_eval_logll,
)
from metrotrpl_tpu.inference.moves import (  # noqa: F401
    MovePlan,
    build_move_plan,
    make_trial_move,
    approve_move,
)
from metrotrpl_tpu.inference.metropolis import (  # noqa: F401
    build_mh_kernel,
    metro,
    run_mh,
)

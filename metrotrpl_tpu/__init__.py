"""metrotrpl_tpu — TPU-native Bayesian inference framework for time-resolved
photoluminescence (TRPL) and terahertz spectroscopy (TRTS) decay curves.

A ground-up JAX/XLA/Pallas re-design with the capabilities of HagesLab/MetroTRPL
(reference layout surveyed in /root/repo/SURVEY.md):

- 1D drift-diffusion-recombination forward models compiled as batched implicit
  SDIRK steppers with parallel-cyclic-reduction block-tridiagonal solves
  (replaces scipy.solve_ivp(LSODA) + numba kernels, reference
  forward_solver.py:41-225,332-418).
- Metropolis-Hastings random walk + parallel tempering as a single on-device
  ``lax.scan`` with chains sharded over a ``jax.sharding.Mesh``
  (replaces the mpi4py driver, reference metropolis.py:140-467).
- Gaussian log-likelihood with IRF convolution and masked fixed-shape
  trimming (replaces trial_move_evaluation.py / laplace.py).
- Config-script / CSV data pipeline compatible with the reference text format
  (bayes_io.py:259-966), dense sampler, MLE mode, checkpointing, and a GUI
  output format the reference visualizer can load.
"""

__version__ = "0.1.0"

from metrotrpl_tpu import constants  # noqa: F401

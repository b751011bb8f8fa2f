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

import os as _os

from metrotrpl_tpu import constants  # noqa: F401


def enable_compile_cache(path=None):
    """Point JAX's persistent compilation cache at a shared directory so
    the heavy kernels (the f64-emulated escalation branch alone compiles
    for ~10 minutes at the flagship shape) are compiled once per machine
    instead of once per process. Verified working through the axon
    remote-compile relay (110 s first process -> 2 s warm). Called by
    every driver entry point (metro / bench / CLI); set
    METROTRPL_NO_COMPILE_CACHE=1 to opt out."""
    if _os.environ.get("METROTRPL_NO_COMPILE_CACHE"):
        return
    import jax

    path = path or _os.path.join(
        _os.path.expanduser("~"), ".cache", "jax_metrotrpl")
    try:
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # never let a cache misconfig break a run
        pass

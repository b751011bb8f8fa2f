"""Run-state IO: history/ensemble containers, checkpoints, logging."""

from metrotrpl_tpu.io.ensemble import Ensemble, History  # noqa: F401
from metrotrpl_tpu.io.logging import start_logging, stop_logging  # noqa: F401

"""Run logging (reference mcmc_logging.py equivalent): timestamped per-run
log files plus console echo, DEBUG level when verbose."""

import logging
import os
from datetime import datetime


def start_logging(log_dir=".", name="Ensemble0", verbose=False):
    """Create a logger writing to <log_dir>/<name><timestamp>.log."""
    os.makedirs(log_dir, exist_ok=True)
    stamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    logger = logging.getLogger(f"metrotrpl.{name}.{stamp}")
    logger.setLevel(logging.DEBUG if verbose else logging.INFO)
    handler = logging.FileHandler(
        os.path.join(log_dir, f"{name}{stamp}.log"), mode="a")
    handler.setFormatter(logging.Formatter(
        "%(asctime)s - %(levelname)s - %(message)s"))
    logger.addHandler(handler)
    return logger, handler


def stop_logging(logger, handler, err_code=0):
    if err_code:
        logger.error(f"Termination with error code {err_code}")
    handler.close()
    logger.removeHandler(handler)

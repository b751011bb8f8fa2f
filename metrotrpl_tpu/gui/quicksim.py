"""Quicksim: re-simulate decay curves from posterior states.

Reference GUI/quicksim.py equivalent: simulations run in a background
``multiprocessing.Process`` streaming results through a Queue so the tk
mainloop stays responsive (reference :90-133); the solver is our batched
SDIRK forward model instead of scipy. When multiple tasks are queued they
are solved as ONE batch.
"""

import multiprocessing as mp
from typing import NamedTuple

import numpy as np


class QuicksimTask(NamedTuple):
    """One re-simulation request (the reference's 'ext var' set,
    GUI/quicksim_entry_popup.py): thickness [nm], nx, final_time [ns], nt,
    fluence [cm^-2], absp [cm^-1], direction (+-1), plus the parameter
    state dict in [cm, V, s] units and the measurement type."""
    thickness: float
    nx: int
    final_time: float
    nt: int
    fluence: float
    absp: float
    direction: float
    params: dict
    meas: str = "TRPL"
    model: str = "std"


#: Default entry-unit -> internal-unit conversions (the staub vocabulary);
#: pass the loaded ensemble's per-run table via ``units`` when available.
DEFAULT_UNITS = {"n0": 1e-21, "p0": 1e-21, "mu_n": 1e5, "mu_p": 1e5,
                 "ks": 1e12, "Cn": 1e33, "Cp": 1e33, "Sf": 1e-2, "Sb": 1e-2}


def run_tasks(tasks, scale_factors=None, dtype="float64", units=None):
    """Solve all tasks as one batch; returns list of (t, sol) arrays.

    units : optional {param: conversion} from the run's config
    (ensemble_fields['units']); defaults to the staub table."""
    import jax.numpy as jnp

    from metrotrpl_tpu.physics.models import beer_lambert
    from metrotrpl_tpu.solver.forward import make_forward_plan, solve_forward_batch

    uc = DEFAULT_UNITS if units is None else units
    if not tasks:
        return []
    if len({t.nx for t in tasks}) != 1:
        raise NotImplementedError("quicksim batch needs a common nx")
    jdtype = jnp.float64 if dtype == "float64" else jnp.float32

    times = [np.linspace(0, t.final_time, t.nt) for t in tasks]
    plan = make_forward_plan(
        [t.thickness for t in tasks], [t.nx for t in tasks],
        [t.meas for t in tasks], times, model=tasks[0].model)

    x = jnp.asarray(plan.x_centers, jdtype)
    fl = jnp.asarray([[t.fluence * 1e-14] for t in tasks], jdtype)
    ab = jnp.asarray([[t.absp * 1e-7] for t in tasks], jdtype)
    dr = jnp.asarray([[t.direction] for t in tasks], jdtype)
    init = beer_lambert(fl, ab, x, dr)

    raw = {}
    keys = set()
    for t in tasks:
        keys |= set(t.params)
    for k in keys:
        raw[k] = jnp.asarray(
            [t.params.get(k, 0.0) * uc.get(k, 1) for t in tasks], jdtype)

    sol = solve_forward_batch(
        init, raw, jnp.asarray(plan.dx, jdtype), jnp.asarray(plan.dt, jdtype),
        jnp.asarray(plan.out_idx), jnp.asarray(plan.is_trpl),
        model=tasks[0].model)
    sol = np.asarray(sol)
    out = []
    for m, t in enumerate(tasks):
        s = sol[m, :t.nt].copy()
        if scale_factors is not None and scale_factors[m] is not None:
            s = s * scale_factors[m]
        out.append((times[m], s))
    return out


def _worker(tasks, scale_factors, queue, units=None):
    try:
        # The child must not contend for the accelerator the main process
        # may hold (a second process attaching to the TPU deadlocks); these
        # small re-simulations run fine on CPU.
        import jax

        jax.config.update("jax_platforms", "cpu")
        # run_tasks defaults to float64 — a fresh spawn child has x64 off
        # and would silently downcast the stiff solve to float32
        jax.config.update("jax_enable_x64", True)
        results = run_tasks(tasks, scale_factors, units=units)
        for i, (t, s) in enumerate(results):
            queue.put((i, t, s, "ok"))
    except Exception as err:  # surface errors to the GUI poller
        queue.put((-1, None, None, f"error: {err}"))
    queue.put(None)  # sentinel


class QuicksimManager:
    """Background-process runner polled by the GUI (reference
    GUI/quicksim.py:16-100 contract: spawn, poll queue, join)."""

    def __init__(self):
        self.proc = None
        self.queue = None

    def simulate(self, tasks, scale_factors=None, units=None):
        ctx = mp.get_context("spawn")
        self.queue = ctx.Queue()
        self.proc = ctx.Process(
            target=_worker, args=(tasks, scale_factors, self.queue, units))
        self.proc.start()

    def poll(self):
        """Non-blocking drain; returns (results, done)."""
        results = []
        done = False
        while self.queue is not None and not self.queue.empty():
            item = self.queue.get_nowait()
            if item is None:
                done = True
            else:
                results.append(item)
        return results, done

    def join(self, timeout=None):
        if self.proc is not None:
            self.proc.join(timeout)
            self.proc = None

"""Batched forward-simulation driver (the reference ``solve()`` equivalent,
reference forward_solver.py:41-225, re-architected for TPU).

A single call advances a whole batch of simulations — (chains x measurements)
or a dense-sampler parameter grid — through one compiled ``lax.scan``. All
shapes are static; per-measurement heterogeneity (thickness, time grids,
measurement type) is carried as batched data, not Python control flow.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from metrotrpl_tpu.physics.grid import make_space_grid, pad_time_grid, plan_time_grid
from metrotrpl_tpu.physics.models import (
    RHS,
    initial_state,
    make_scaled_params,
    observable_multipliers,
    observables_std,
)
from metrotrpl_tpu.solver.sdirk import SDIRK_SCHEMES, integrate_observables

PARAM_NAMES_STD = ("n0", "p0", "mu_n", "mu_p", "ks", "Cn", "Cp", "Sf", "Sb",
                   "tauN", "tauP", "eps", "Tm")
PARAM_NAMES_TRAPS = PARAM_NAMES_STD + ("kC", "Nt", "tauE")


class ForwardPlan(NamedTuple):
    """Static per-measurement solve plan (host-side numpy).

    All measurements share nx and the padded (n_steps, nt) sizes so they
    batch into one scan.
    """
    nx: int
    n_steps: int
    nt: int
    model: str
    scheme: str
    newton_iters: int
    dx: np.ndarray          # (M,)
    x_centers: np.ndarray   # (M, nx) cell centers [nm]
    dt: np.ndarray          # (M, n_steps) step sizes [ns]
    out_idx: np.ndarray     # (M, nt) knot index per output time
    out_mask: np.ndarray    # (M, nt) True where the output slot is real
    is_trpl: np.ndarray     # (M,) True for TRPL, False for TRTS
    nt_actual: np.ndarray   # (M,) true number of output points


def make_forward_plan(lengths, nxes, meas_types, times_list, hmax=4.0,
                      model="std", scheme="sdirk3", newton_iters=2,
                      h0=1e-3, growth=1.25, refine=1):
    """Build a ForwardPlan for a measurement set.

    times_list : list of per-measurement output-time arrays (must start at 0).
    All nx must currently be equal (pad-to-max masking of the spatial grid is
    not yet implemented; the reference staub workloads use a common nx,
    reference MCMC_script_writer.py:48).
    """
    nxes = list(nxes)
    if len(set(int(n) for n in nxes)) != 1:
        raise NotImplementedError(
            "Batched solver currently requires a common nx across measurements"
        )
    nx = int(nxes[0])
    grids = [plan_time_grid(t, hmax=hmax, h0=h0, growth=growth, refine=refine)
             for t in times_list]
    n_steps = max(len(g.dt) for g in grids)
    nt = max(len(g.out_idx) for g in grids)
    padded = [pad_time_grid(g, n_steps, nt) for g in grids]

    space = [make_space_grid(th, nx) for th in lengths]
    nt_actual = np.array([len(t) for t in times_list])
    out_mask = np.arange(nt)[None, :] < nt_actual[:, None]

    return ForwardPlan(
        nx=nx,
        n_steps=n_steps,
        nt=nt,
        model=model,
        scheme=scheme,
        newton_iters=newton_iters,
        dx=np.array([g.dx for g in space]),
        x_centers=np.stack([g.x_centers for g in space]),
        dt=np.stack([g.dt for g in padded]),
        out_idx=np.stack([g.out_idx for g in padded]),
        out_mask=out_mask,
        is_trpl=np.array([m == "TRPL" for m in meas_types]),
        nt_actual=nt_actual,
    )


def solve_forward_batch(init_dN, raw_params, dx, dt, out_idx, is_trpl,
                        model="std", scheme="sdirk3", newton_iters=2,
                        min_y=None, backend="xla", block_b=16):
    """Run a batch of forward simulations and return linear observables in
    measurement units (TRPL [cm^-2 s^-1] / TRTS, selected per row).

    Shapes (B = batch):
    init_dN   (B, nx) excess-density profile [nm^-3]
    raw_params dict name -> (B,) model-unit parameters
    dx        (B,)
    dt        (B, n_steps)
    out_idx   (B, nt) int
    is_trpl   (B,) bool

    Returns sol (B, nt) with the reference's tail clamp applied: after the
    first time the signal dips below min_y everything is held at min_y
    (reference forward_solver.py:190-201).
    """
    # Pad the batch to a multiple of the float32 sublane count. This keeps
    # every (B, nx) plane tile-aligned AND works around an observed TPU
    # (axon/Mosaic) miscompile where sublane-padded batches (e.g. B=6)
    # produce corrupted rows; padded rows replicate row 0 and are dropped
    # before returning.
    B_in = init_dN.shape[0]
    pad = (-B_in) % (block_b if backend.startswith("pallas") else 8)
    if pad:
        def _pad8(a):
            a = jnp.asarray(a)
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0)
        init_dN = _pad8(init_dN)
        raw_params = {k: _pad8(v) for k, v in raw_params.items()}
        dx = _pad8(dx)
        dt = _pad8(dt)
        out_idx = _pad8(out_idx)
        is_trpl = _pad8(is_trpl)

    dtype = init_dN.dtype
    # Per-simulation density scale: keeps the state O(1) in float32.
    ns = jnp.max(init_dN, axis=-1) + raw_params["p0"] + raw_params["n0"]

    p = make_scaled_params(raw_params, dx, ns)
    p = jax.tree.map(lambda a: jnp.asarray(a, dtype)[..., None], p)
    dxb = jnp.asarray(dx, dtype)[..., None]

    y0 = initial_state(init_dN, ns[..., None], model=model, dtype=dtype)
    dts = jnp.asarray(dt, dtype).T  # (n_steps, B)

    if backend in ("pallas", "pallas_interpret"):
        from metrotrpl_tpu.solver.pallas_step import integrate_observables_pallas
        pl_t, trts_t = integrate_observables_pallas(
            p, y0, dts, jnp.asarray(dx, dtype), model=model,
            scheme_name=scheme, newton_iters=newton_iters, block_b=block_b,
            interpret=(backend == "pallas_interpret"))
    else:
        rhs_fn = RHS[model]
        rhs = lambda y: rhs_fn(y, p)
        observe = lambda y: observables_std(y, p, dxb[..., 0], model=model)
        pl_t, trts_t = integrate_observables(
            rhs, observe, y0, dts, scheme_name=scheme,
            newton_iters=newton_iters)
    # (n_steps+1, B) -> (B, nt) gather at output knots
    pl_out = jnp.take_along_axis(pl_t.T, out_idx, axis=1)
    trts_out = jnp.take_along_axis(trts_t.T, out_idx, axis=1)

    pl_mult, trts_mult = observable_multipliers(raw_params, ns)
    sol = jnp.where(
        is_trpl[:, None],
        pl_out * pl_mult[:, None],
        trts_out * trts_mult[:, None],
    )

    if min_y is None:
        min_y = float(np.finfo(np.dtype(dtype)).tiny)
    below = sol < min_y
    first = jnp.argmax(below, axis=1)
    do_clamp = jnp.take_along_axis(below, first[:, None], axis=1)
    tail = jnp.arange(sol.shape[1])[None, :] >= first[:, None]
    sol = jnp.where(tail & do_clamp, min_y, sol)
    return sol[:B_in]


def solve_single(init_dN, raw_params, thickness, nx, t_out, meas="TRPL",
                 model="std", hmax=4.0, scheme="sdirk3", newton_iters=2,
                 dtype=jnp.float64, refine=1, h0=1e-3, growth=1.25):
    """Convenience single-simulation solve (tests, GUI quicksim).

    Mirrors the oracle's :func:`solve_reference` interface.
    """
    plan = make_forward_plan(
        [thickness], [nx], [meas], [np.asarray(t_out)], hmax=hmax,
        model=model, scheme=scheme, newton_iters=newton_iters, refine=refine,
        h0=h0, growth=growth)
    params_b = {k: jnp.asarray([v], dtype) for k, v in raw_params.items()}
    sol = solve_forward_batch(
        jnp.asarray(init_dN, dtype)[None],
        params_b,
        jnp.asarray(plan.dx, dtype),
        jnp.asarray(plan.dt, dtype),
        jnp.asarray(plan.out_idx),
        jnp.asarray(plan.is_trpl),
        model=model, scheme=scheme, newton_iters=newton_iters)
    return np.asarray(sol[0])
